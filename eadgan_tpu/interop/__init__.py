"""Interop with the reference's PyTorch checkpoints.

Converts reference-trained ``.pt``/``.tar`` state_dicts into this
framework's flax parameter trees, so users switching from the reference
keep their trained models (and the eval suite can score
reference-trained encoders directly — the BetaVAE-parity comparison of
BASELINE.md).
"""

from eadgan_tpu.interop.torch_import import (
    import_celeba_discriminator,
    import_mnist_discriminator,
    import_celeba_generator,
    import_mnist_encoder,
    import_mnist_generator,
    import_approximator,
    import_sprites_discriminator,
    import_sprites_encoder,
    import_sprites_encoder_pxy,
    import_sprites_generator,
)

__all__ = [
    "import_approximator",
    "import_mnist_generator",
    "import_mnist_encoder",
    "import_mnist_discriminator",
    "import_sprites_encoder_pxy",
    "import_sprites_generator",
    "import_sprites_discriminator",
    "import_sprites_encoder",
    "import_celeba_generator",
    "import_celeba_discriminator",
]
