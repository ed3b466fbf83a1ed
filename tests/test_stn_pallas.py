"""Pallas warp kernel: parity with the XLA gather implementation (which
is itself golden-tested against torch) and gradient correctness.

Runs in Pallas interpret mode on the CPU test backend; the compiled
kernel is validated on real TPU hardware separately (bit-matching to
~1e-5, 4.6x faster — see eadgan_tpu/ops/stn_pallas.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.ops import warp_affine
from eadgan_tpu.ops.stn_pallas import warp_affine_pallas
from eadgan_tpu.transforms import RP, RPQMNXY, code_to_matrix


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("channels", [1, 3])
def test_pallas_matches_xla(rng, padding_mode, channels):
    img = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, channels)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, (4, 4)).astype(np.float32))
    mat = code_to_matrix(RP, code)
    ref = warp_affine(img, mat, padding_mode=padding_mode, impl="xla")
    got = warp_affine_pallas(img, mat, padding_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_pallas_extreme_transforms(rng, padding_mode):
    """Far out-of-bounds sampling exercises both padding paths."""
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    code = jnp.asarray((rng.uniform(-1, 1, (2, 7)) * 3).astype(np.float32))
    mat = code_to_matrix(RPQMNXY, code)
    ref = warp_affine(img, mat, padding_mode=padding_mode, impl="xla")
    got = warp_affine_pallas(img, mat, padding_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_gradients_match_xla(rng):
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, (2, 4)).astype(np.float32))

    def loss(fn):
        def inner(img, code):
            mat = code_to_matrix(RP, code)
            return jnp.sum(fn(img, mat) ** 2)

        return inner

    g_ref = jax.grad(loss(lambda i, m: warp_affine(i, m, impl="xla")), argnums=(0, 1))(
        img, code
    )
    g_pal = jax.grad(
        loss(lambda i, m: warp_affine_pallas(i, m, "border")), argnums=(0, 1)
    )(img, code)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pallas_non_square_images(rng):
    """H != W exercises the row-block/lane layout independently."""
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, (2, 4)).astype(np.float32))
    mat = code_to_matrix(RP, code)
    for pad in ("border", "zeros"):
        ref = warp_affine(img, mat, padding_mode=pad, impl="xla")
        got = warp_affine_pallas(img, mat, pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_odd_height_uses_unit_blocks(rng):
    img = jnp.asarray(rng.uniform(0, 1, (2, 17, 16, 1)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, (2, 4)).astype(np.float32))
    mat = code_to_matrix(RP, code)
    ref = warp_affine(img, mat, impl="xla")
    got = warp_affine_pallas(img, mat, "border")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pair_packed_path_matches_unpaired(rng):
    """Even grayscale batches take the block-diagonal two-per-program
    MXU packing; odd batches fall back to one-per-program.  Warping an
    even batch must give exactly the same images as warping it as an
    odd batch plus the leftover element."""
    img = jnp.asarray(rng.uniform(0, 1, (6, 64, 64, 1)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, (6, 4)).astype(np.float32))
    mat = code_to_matrix(RP, code)
    paired = warp_affine_pallas(img, mat, "border")          # n=6: packed
    unpaired_a = warp_affine_pallas(img[:5], mat[:5], "border")  # n=5: single
    unpaired_b = warp_affine_pallas(img[5:6], mat[5:6], "border")
    np.testing.assert_allclose(
        np.asarray(paired),
        np.concatenate([np.asarray(unpaired_a), np.asarray(unpaired_b)]),
        atol=1e-6,
    )
