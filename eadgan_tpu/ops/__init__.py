"""TPU-native compute primitives (layer L2 / the N* rows of SURVEY.md 2.2).

Replaces the native-backed PyTorch ops the reference delegates to:
``F.affine_grid`` + ``F.grid_sample`` (N2), ``spectral_norm`` (N3),
``torch.inverse`` on (B, 3, 3) (N4 — lives in
:mod:`eadgan_tpu.transforms.affine` as :func:`inverse_affine`).
"""

from eadgan_tpu.ops.stn import affine_grid, grid_sample, warp_affine
from eadgan_tpu.ops.init import (
    torch_conv_kernel_init,
    torch_linear_bias_init,
    torch_linear_kernel_init,
    normal_init,
)

__all__ = [
    "affine_grid",
    "grid_sample",
    "warp_affine",
    "torch_conv_kernel_init",
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
    "normal_init",
]
