"""Latent code <-> affine parameter <-> matrix algebra (layer L1).

One module replaces the eight duplicated ``utils_*`` files of the
reference (``MNIST/utils_rpqmnxy.py``, ``dSprites/utils_pxy.py``,
``dSprites/utils_rp.py``, ``colored_dSprites/utils_pxy.py``,
``colored_dSprites/utils_rp_color.py``, ``celebA/utils_rpqxy.py``,
``*/score/utils_pxy.py``).

Everything here is pure jax.numpy, built in-graph on device: the
reference constructs matrices on the CPU and ships them to the GPU every
step (e.g. dSprites/utils_rp.py:57,113); on TPU the whole algebra fuses
into the jitted train step.
"""

from eadgan_tpu.transforms.affine import (
    PXY,
    RP,
    RPQXY,
    RPQMNXY,
    FAMILIES,
    AffineFamily,
    build_affine_matrix,
    code_to_matrix,
    code_to_params,
    compose_relative,
    inverse_affine,
    params_to_code,
    pxy_align_matrix,
    regularize,
    regularize_matrix,
)
from eadgan_tpu.transforms.neural import (
    flatten_matrix_2x3,
    regularize_neural,
)
from eadgan_tpu.transforms.color import (
    apply_color,
    color_code_to_gain,
    gain_to_color_code,
    regularize_color,
    remove_color,
)

__all__ = [
    "PXY",
    "RP",
    "RPQXY",
    "RPQMNXY",
    "FAMILIES",
    "AffineFamily",
    "build_affine_matrix",
    "code_to_matrix",
    "code_to_params",
    "compose_relative",
    "inverse_affine",
    "params_to_code",
    "pxy_align_matrix",
    "regularize",
    "regularize_matrix",
    "flatten_matrix_2x3",
    "regularize_neural",
    "apply_color",
    "color_code_to_gain",
    "gain_to_color_code",
    "regularize_color",
    "remove_color",
]
