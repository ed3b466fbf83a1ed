"""Neural affine regularizer for the rpqmnxy family.

The full rotation+anisotropic-zoom+skew+translation composition has no
closed-form least-squares inverse, so the reference trains an MLP to
invert flattened 2x3 matrices and applies it frozen inside the info loss
(MNIST/utils_rpqmnxy.py:117-134).
"""

from __future__ import annotations

import jax.numpy as jnp

from eadgan_tpu.transforms.affine import (
    AffineFamily,
    RPQMNXY,
    code_to_matrix,
    compose_relative,
    params_to_code,
)

__all__ = ["flatten_matrix_2x3", "regularize_neural"]


def flatten_matrix_2x3(matrix: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3) -> (B, 6): rows 0 and 1 concatenated
    (MNIST/utils_rpqmnxy.py:128, approximate_rpqmnxy.py:129)."""
    return jnp.concatenate([matrix[:, 0, :], matrix[:, 1, :]], axis=-1)


def regularize_neural(
    approximator,
    approx_variables,
    real_code: jnp.ndarray,
    trans_code: jnp.ndarray,
    family: AffineFamily = RPQMNXY,
) -> jnp.ndarray:
    """Recover the relative latent code via the frozen approximator MLP.

    Mirrors ``affine_regularizer`` (MNIST/utils_rpqmnxy.py:117-134):
    build both matrices from the predicted codes, compose
    ``trans @ real^-1``, flatten, run the MLP (which emits *physical*
    parameters), and unscale to latent-code units.
    """
    real_matrix = code_to_matrix(family, real_code[..., : family.n_affine])
    trans_matrix = code_to_matrix(family, trans_code[..., : family.n_affine])
    rel = compose_relative(real_matrix, trans_matrix)
    params = approximator.apply(approx_variables, flatten_matrix_2x3(rel))
    return params_to_code(family, params)
