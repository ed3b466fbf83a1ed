"""MNIST model family (32x32 grayscale InfoGAN-style architecture).

Parity with MNIST/EAD-GAN_rpqmnxy.py:71-175.  The reference applies
``weights_init_normal`` (:54-60) to all three models; its effect in
torch is subtle and reproduced faithfully:

* Generator conv kernels + all BatchNorm scales -> N(0/1, 0.02);
* Discriminator/Encoder conv kernels are wrapped in spectral_norm, whose
  pre-forward hook recomputes the weight from ``weight_orig`` — so the
  normal init is overwritten on the first forward and the *effective*
  init is the torch default (kaiming-uniform / sigma).  Encoder BN
  scales do get the normal init.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from eadgan_tpu.models.layers import (
    SNConv,
    SNDense,
    TorchBatchNorm,
    TorchConv,
    TorchDense,
    upsample_nearest,
)

__all__ = ["MnistGenerator", "MnistDiscriminator", "MnistEncoder"]


class MnistGenerator(nn.Module):
    """Linear(z||label||code -> 128*8*8) -> BN/upsample/conv stack -> tanh
    (MNIST/EAD-GAN_rpqmnxy.py:71-98).  BN eps quirk preserved: the inner
    BatchNorms receive eps=0.8 (``nn.BatchNorm2d(ch, 0.8)``)."""

    latent_dim: int = 62
    n_classes: int = 10
    code_dim: int = 7
    img_size: int = 32
    channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, noise, labels, code, train: bool = True):
        # train=True: batch-stats BN (reference training never evals);
        # train=False: running stats like generate_image.py's .eval()
        ra = not train
        x = jnp.concatenate([noise, labels, code], axis=-1)
        init_size = self.img_size // 4
        x = TorchDense(128 * init_size * init_size, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], 128, init_size, init_size)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW view parity -> NHWC

        x = TorchBatchNorm(use_normal_init=True)(x, use_running_average=ra)
        x = upsample_nearest(x)
        x = TorchConv(128, 3, 1, 1, use_normal_init=True, dtype=self.dtype)(x)
        x = TorchBatchNorm(eps=0.8, use_normal_init=True)(x, use_running_average=ra)
        x = nn.leaky_relu(x, 0.2)
        x = upsample_nearest(x)
        x = TorchConv(64, 3, 1, 1, use_normal_init=True, dtype=self.dtype)(x)
        x = TorchBatchNorm(eps=0.8, use_normal_init=True)(x, use_running_average=ra)
        x = nn.leaky_relu(x, 0.2)
        x = TorchConv(self.channels, 3, 1, 1, use_normal_init=True, dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class MnistDiscriminator(nn.Module):
    """Four SN-conv blocks 1->16->32->64->128 (k3 s2 p1) + SN-Linear -> 1,
    raw logits for the LSGAN MSE loss (MNIST/EAD-GAN_rpqmnxy.py:101-134)."""

    img_size: int = 32
    channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for feats in (16, 32, 64, 128):
            x = SNConv(feats, 3, 2, 1, dtype=self.dtype)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        return SNDense(1)(x, update_stats=train).astype(jnp.float32)


class MnistEncoder(nn.Module):
    """SN-conv trunk with BN(eps=0.8) after blocks 2-4, three heads:
    softmax class, code, noise (MNIST/EAD-GAN_rpqmnxy.py:137-175)."""

    latent_dim: int = 62
    n_classes: int = 10
    code_dim: int = 7
    img_size: int = 32
    channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for i, feats in enumerate((16, 32, 64, 128)):
            x = SNConv(feats, 3, 2, 1, dtype=self.dtype)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
            if i > 0:
                x = TorchBatchNorm(eps=0.8, use_normal_init=True)(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        label = nn.softmax(SNDense(self.n_classes)(x, update_stats=train), axis=-1)
        code = SNDense(self.code_dim)(x, update_stats=train)
        noise = SNDense(self.latent_dim)(x, update_stats=train)
        return label, code, noise
