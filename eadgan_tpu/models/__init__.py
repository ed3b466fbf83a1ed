"""Model zoo (layer L3): the five reference model families, rebuilt as
flax modules in NHWC layout for the TPU.

Families and their reference definitions:

* MNIST  Generator / Discriminator / Encoder  (MNIST/EAD-GAN_rpqmnxy.py:71-175)
* dSprites Encoder_pxy / Generator / Discriminator / Encoder
  (dSprites/pxy.py:54-80, dSprites/rp.py:61-194) — ``channels`` and
  ``code_dim`` parameters also cover the colored variants
  (colored_dSprites/rp_color.py:59-192)
* CelebA Generator / Discriminator-with-info-head
  (celebA/EAD-GAN_celebA.py:67-138)
* Affine approximator MLP (MNIST/approximate_rpqmnxy.py:20-42)
"""

from eadgan_tpu.models.approximator import AffineApproximator
from eadgan_tpu.models.mnist import (
    MnistDiscriminator,
    MnistEncoder,
    MnistGenerator,
)
from eadgan_tpu.models.dsprites import (
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)
from eadgan_tpu.models.celeba import CelebaDiscriminator, CelebaGenerator

__all__ = [
    "AffineApproximator",
    "MnistGenerator",
    "MnistDiscriminator",
    "MnistEncoder",
    "SpritesEncoderPxy",
    "SpritesGenerator",
    "SpritesDiscriminator",
    "SpritesEncoder",
    "CelebaGenerator",
    "CelebaDiscriminator",
]
