"""Building-block layers with PyTorch-parity semantics on NHWC tensors.

Covers the native-backed primitives of SURVEY.md 2.2: cuDNN convs (N1)
become ``lax.conv_general_dilated`` through flax, and the spectral-norm
weight hook (N3) becomes functional power-iteration state carried in the
``batch_stats`` collection of the train state.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from eadgan_tpu.ops.init import (
    normal_init,
    torch_conv_kernel_init,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)

__all__ = [
    "TorchConv",
    "TorchConvTranspose",
    "TorchDense",
    "SNConv",
    "SNDense",
    "TorchBatchNorm",
    "upsample_nearest",
    "leaky_relu",
]


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class TorchConv(nn.Module):
    """Conv2d with torch-default (or normal) init; NHWC in/out.

    ``padding`` is symmetric int padding like torch's; geometry matches
    ``nn.Conv2d(in, out, kernel, stride, padding)``.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_normal_init: bool = False
    dtype: Any = None  # compute dtype (bf16 for the MXU fast path)

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = k[0] * k[1] * in_ch
        kernel_init = (
            normal_init() if self.use_normal_init else torch_conv_kernel_init()
        )
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.strides),
            padding=[_pair(self.padding), _pair(self.padding)],
            kernel_init=kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d parity: for kernel 4 / stride 2 / padding 1 the
    output doubles spatially; for kernel 4 / stride 1 / padding 0 a 1x1
    input becomes 4x4 (celebA/EAD-GAN_celebA.py:76).

    Uses lax.conv_transpose geometry: out = (in-1)*s + k - 2*p.
    Torch's fan-in quirk for transposed convs (computed from the output
    channel dim) is mirrored in the init.
    """

    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: int = 1
    use_normal_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        fan_in = k[0] * k[1] * self.features  # torch convT quirk
        kernel_init = (
            normal_init()
            if self.use_normal_init
            else torch_conv_kernel_init(transpose=True)
        )
        # lax.conv_transpose pads the stride-dilated input directly, so
        # torch's ConvTranspose2d padding p maps to (k - 1 - p) per side:
        # out = (in - 1) * s - 2p + k  (verified empirically vs flax).
        pads = [(kk - 1 - self.padding, kk - 1 - self.padding) for kk in k]
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.strides),
            padding=pads,
            kernel_init=kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class TorchDense(nn.Module):
    """Linear with torch-default init."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            features=self.features,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(x.shape[-1]),
            dtype=self.dtype,
        )(x)


class SNConv(nn.Module):
    """Spectral-normalized conv (torch ``spectral_norm(nn.Conv2d(...))``).

    Power-iteration state (u vector, sigma) lives in ``batch_stats`` and
    is updated once per call when ``update_stats=True`` — the functional
    equivalent of torch's pre-forward hook (SURVEY.md hard part #2).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        k = _pair(self.kernel_size)
        fan_in = k[0] * k[1] * x.shape[-1]
        conv = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.strides),
            padding=[_pair(self.padding), _pair(self.padding)],
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
        )
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class SNDense(nn.Module):
    """Spectral-normalized linear (torch ``spectral_norm(nn.Linear(...))``)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        dense = nn.Dense(
            features=self.features,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(x.shape[-1]),
            dtype=self.dtype,
        )
        return nn.SpectralNorm(dense)(x, update_stats=update_stats)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d parity.

    torch momentum 0.1 == flax momentum 0.9 (flax keeps
    ``momentum * running + (1 - momentum) * batch``).  The reference
    never switches generators to eval mode, so normalization always uses
    batch statistics (``use_running_average=False``); running stats are
    still tracked for checkpoint parity.

    ``eps`` defaults to 1e-5; the MNIST generator/encoder pass 0.8 —
    the reference's ``nn.BatchNorm2d(ch, 0.8)`` sets *eps* positionally
    (almost certainly intending momentum; the quirk is preserved because
    it changes normalization magnitudes, MNIST/EAD-GAN_rpqmnxy.py:83-87,145).

    ``use_running_average=True`` reproduces torch ``.eval()`` semantics —
    the reference never evals during *training*, but its inference
    scripts do (MNIST/generate_image.py:154, celebA/gen_imgs.py:114), so
    generators expose it via their ``train`` flag.
    """

    eps: float = 1e-5
    momentum: float = 0.9
    use_normal_init: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        scale_init = normal_init(1.0, 0.02) if self.use_normal_init else nn.initializers.ones
        # Batch statistics always in float32 — under the bf16 fast path
        # the conv outputs arrive in bf16, but variance estimation at
        # half precision destabilizes GAN training.  flax's BatchNorm
        # already computes mean/var in f32 regardless of input dtype
        # (dtype=None promotes stats), so no explicit up-cast of the
        # activations is needed around it — tests/test_bf16.py pins
        # both contracts (stats dtype + f32-vs-bf16 agreement).  The
        # output cast keeps the layer's dtype contract: flax promotes
        # the normalized result to f32 (f32 scale/bias), and without
        # the cast every op between a BN and the next conv would move
        # f32 activations on the bf16 path.
        out = nn.BatchNorm(
            momentum=self.momentum,
            epsilon=self.eps,
            scale_init=scale_init,
        )(x, use_running_average=use_running_average)
        return out.astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=2)`` (nearest) on NHWC."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=negative_slope)
