"""Affine-inverse approximator MLP.

Learns to map a flattened 2x3 relative affine matrix back to the seven
physical rpqmnxy parameters — the neural stand-in for a closed-form
inverse that does not exist for the full rotation+zoom+skew family.
Parity: ``Affine_classifier`` (MNIST/approximate_rpqmnxy.py:20-42,
MNIST/utils_rpqmnxy.py:12-34): Linear 6->256->256->256->256->7 with
default-slope LeakyReLU (0.01).
"""

from __future__ import annotations

import flax.linen as nn

from eadgan_tpu.models.layers import TorchDense

__all__ = ["AffineApproximator"]


class AffineApproximator(nn.Module):
    hidden: int = 256
    out_dim: int = 7
    depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train  # no normalization/SN state in this MLP
        for _ in range(self.depth):
            x = TorchDense(self.hidden)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return TorchDense(self.out_dim)(x)
