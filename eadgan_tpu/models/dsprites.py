"""dSprites model family (64x64, grayscale or colored).

Parity with dSprites/pxy.py:54-80 and dSprites/rp.py:61-194; setting
``channels=3`` / wider code dims reproduces the colored variants
(colored_dSprites/pxy_color.py:51-77, colored_dSprites/rp_color.py:59-192).
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
    TorchConvTranspose,
    TorchDense,
)

__all__ = [
    "SpritesEncoderPxy",
    "SpritesGenerator",
    "SpritesDiscriminator",
    "SpritesEncoder",
]


class SpritesEncoderPxy(nn.Module):
    """Zoom/position (+color) alignment encoder: plain conv 4x2x1 trunk
    with LeakyReLU(0.1) + Linear(1024 -> out_dim)
    (dSprites/pxy.py:54-80; out_dim=6 for colored,
    colored_dSprites/pxy_color.py:51-77)."""

    out_dim: int = 3
    channels: int = 1

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = img
        for feats in (32, 32, 64, 64):
            x = TorchConv(feats, 4, 2, 1)(x)
            x = nn.leaky_relu(x, 0.1)
        x = x.reshape(x.shape[0], -1)
        return TorchDense(self.out_dim)(x)


class SpritesGenerator(nn.Module):
    """fc(in -> 128 -> 64*4*4) + 4 ConvT(4,2,1) blocks -> sigmoid
    (dSprites/rp.py:123-157).  Input is label one-hot || code only — no
    noise vector (the reference's latent_dim flag is dead)."""

    channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, z_c, train: bool = True):
        # train=False -> running-stat BN like torch .eval() (the
        # reference trains with batch stats but inference scripts eval)
        x = nn.relu(TorchDense(128, dtype=self.dtype)(z_c))
        x = nn.relu(TorchDense(64 * 4 * 4, dtype=self.dtype)(x))
        x = x.reshape(x.shape[0], 64, 4, 4)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW view parity -> NHWC
        for _ in range(3):
            x = TorchConvTranspose(64, 4, 2, 1, dtype=self.dtype)(x)
            x = TorchBatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        x = TorchConvTranspose(self.channels, 4, 2, 1, dtype=self.dtype)(x)
        return nn.sigmoid(x).astype(jnp.float32)


class SpritesDiscriminator(nn.Module):
    """SN-conv trunk + fc 1024->128->1, sigmoid output for BCE
    (dSprites/rp.py:90-119)."""

    channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for feats in (32, 32, 64, 64):
            x = SNConv(feats, 4, 2, 1, dtype=self.dtype)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(SNDense(128, dtype=self.dtype)(x, update_stats=train), 0.2)
        x = TorchDense(1, dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


class SpritesEncoder(nn.Module):
    """SN trunk + two SN fc layers, softmax category head + continuous
    code head (dSprites/rp.py:160-194; code_dim=7 for colored,
    colored_dSprites/rp_color.py:158-192)."""

    n_classes: int = 3
    code_dim: int = 4
    channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for feats in (32, 32, 64, 64):
            x = SNConv(feats, 4, 2, 1, dtype=self.dtype)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(SNDense(128, dtype=self.dtype)(x, update_stats=train), 0.2)
        x = nn.leaky_relu(SNDense(128, dtype=self.dtype)(x, update_stats=train), 0.2)
        x = x.astype(jnp.float32)
        cat = nn.softmax(SNDense(self.n_classes)(x, update_stats=train), axis=-1)
        cont = SNDense(self.code_dim)(x, update_stats=train)
        return cat, cont
