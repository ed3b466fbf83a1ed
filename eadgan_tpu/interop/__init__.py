"""Interop with the reference's PyTorch checkpoints — both directions.

``torch_import`` converts reference-trained ``.pt``/``.tar`` state_dicts
into this framework's flax parameter trees, so users switching from the
reference keep their trained models (and the eval suite can score
reference-trained encoders directly — the BetaVAE-parity comparison of
BASELINE.md).  ``torch_export`` is the exact inverse, so the reference's
own consumers (MNIST/generate_image.py, celebA/gen_imgs.py, the score
scripts) can load weights trained here.
"""

from eadgan_tpu.interop.torch_export import (
    export_approximator,
    export_celeba_discriminator,
    export_celeba_generator,
    export_mnist_discriminator,
    export_mnist_encoder,
    export_mnist_generator,
    export_sprites_discriminator,
    export_sprites_encoder,
    export_sprites_encoder_pxy,
    export_sprites_generator,
    save_torch_state_dict,
)
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
    "export_approximator",
    "export_mnist_generator",
    "export_mnist_encoder",
    "export_mnist_discriminator",
    "export_sprites_encoder_pxy",
    "export_sprites_generator",
    "export_sprites_discriminator",
    "export_sprites_encoder",
    "export_celeba_generator",
    "export_celeba_discriminator",
    "save_torch_state_dict",
]
