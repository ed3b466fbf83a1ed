"""Parameter initializers with PyTorch-default parity.

The reference relies on two init regimes:

* explicit ``weights_init_normal`` — N(0, 0.02) conv weights, N(1, 0.02)
  BatchNorm scale, zero BN bias — applied only by the MNIST trainer
  (MNIST/EAD-GAN_rpqmnxy.py:54-60, 229-231);
* PyTorch *defaults* everywhere else (dSprites, colored, CelebA):
  ``kaiming_uniform_(a=sqrt(5))`` which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights, and the same bound
  for biases.

GAN training dynamics are sensitive to the init distribution, so both
regimes are reproduced exactly (as distributions, not bit-for-bit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "torch_conv_kernel_init",
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
    "normal_init",
]


def _uniform(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_kernel_init(transpose: bool = False):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for flax HWIO conv kernels.

    For ``ConvTranspose`` mirrors torch's quirk of computing fan_in from
    dim 1 of its (in, out, kh, kw) weight — i.e. kh*kw*out_channels.
    """

    def init(key, shape, dtype=jnp.float32):
        *window, in_ch, out_ch = shape
        receptive = 1
        for k in window:
            receptive *= k
        fan_in = receptive * (out_ch if transpose else in_ch)
        return _uniform(key, shape, dtype, 1.0 / (fan_in**0.5))

    return init


def torch_linear_kernel_init():
    """U(-1/sqrt(in_features), ...) for flax (in, out) dense kernels."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        return _uniform(key, shape, dtype, 1.0 / (fan_in**0.5))

    return init


def torch_linear_bias_init(fan_in: int):
    """Bias init needs the layer fan-in, which the bias shape does not
    carry — callers pass it explicitly."""

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, dtype, 1.0 / (fan_in**0.5))

    return init


def normal_init(mean: float = 0.0, stddev: float = 0.02):
    """N(mean, stddev) — the MNIST ``weights_init_normal`` regime."""

    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)

    return init
