"""CelebA model family (64x64 RGB, DCGAN scale).

Parity with celebA/EAD-GAN_celebA.py:67-138.  The discriminator is the
InfoGAN shared-head variant: one conv tower ending in a
Conv(1024 -> 1 + n_classes + code_dim, 4, 1, 0) whose output splits
into validity / categorical / continuous heads — there is no separate
encoder in this pipeline.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from typing import Any

from eadgan_tpu.models.layers import SNConv, TorchBatchNorm, TorchConv, TorchConvTranspose

__all__ = ["CelebaGenerator", "CelebaDiscriminator"]


class CelebaGenerator(nn.Module):
    """ConvT(218 -> 1024, 4, 1, 0) -> 1024 -> 512 -> 256 -> 128 -> 3 with
    BN+ReLU between stages (celebA/EAD-GAN_celebA.py:67-102).  Quirk
    preserved: no BN/ReLU after the first ConvT (:76-78)."""

    latent_dim: int = 200
    n_classes: int = 10
    code_dim: int = 8
    channels: int = 3
    dtype: Any = None  # bf16 for the MXU fast path; params stay f32

    @nn.compact
    def __call__(self, noise, labels, code, train: bool = True):
        # train=False -> running-stat BN like torch .eval() (gen_imgs.py)
        x = jnp.concatenate([noise, labels, code], axis=-1)
        x = x[:, None, None, :]  # (B, 1, 1, in_dim) NHWC
        x = TorchConvTranspose(1024, 4, 1, 0, dtype=self.dtype)(x)
        for feats in (512, 256, 128):
            x = TorchConvTranspose(feats, 4, 2, 1, dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        x = TorchConvTranspose(self.channels, 4, 2, 1, dtype=self.dtype)(x)
        return jnp.tanh(x).astype(jnp.float32)


class CelebaDiscriminator(nn.Module):
    """SN-conv tower 3->128->256->512->1024 (k4 s2 p1, LeakyReLU 0.1) +
    plain Conv(1024 -> 1+n_classes+code_dim, 4, 1, 0); returns
    (cat, cont, validity) exactly as the reference splits them
    (celebA/EAD-GAN_celebA.py:126-138): validity = sigmoid(out[:, 0]),
    cont = out[:, 1:code_dim+1], cat = softmax(out[:, code_dim+1:])."""

    n_classes: int = 10
    code_dim: int = 8
    channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for feats in (128, 256, 512, 1024):
            x = SNConv(feats, 4, 2, 1, dtype=self.dtype)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.1)
        x = TorchConv(1 + self.n_classes + self.code_dim, 4, 1, 0, dtype=self.dtype)(x)
        out = x.reshape(x.shape[0], -1).astype(jnp.float32)
        validity = nn.sigmoid(out[:, 0])
        cont = out[:, 1 : self.code_dim + 1]
        cat = nn.softmax(
            out[:, self.code_dim + 1 : self.code_dim + 1 + self.n_classes], axis=-1
        )
        return cat, cont, validity
