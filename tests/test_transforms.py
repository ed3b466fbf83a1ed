"""Property tests for the affine/color code algebra (transforms layer).

The key invariant is the one the reference implements analytically
(SURVEY.md section 4): recovering the parameters of a matrix built from
known parameters is exact, and for composition-closed families the full
``regularize(compose)`` loop returns the sampled relative code.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eadgan_tpu.transforms import (
    FAMILIES,
    PXY,
    RP,
    RPQXY,
    RPQMNXY,
    code_to_matrix,
    code_to_params,
    compose_relative,
    inverse_affine,
    params_to_code,
    pxy_align_matrix,
    regularize,
    regularize_matrix,
)
from eadgan_tpu.transforms import (
    apply_color,
    color_code_to_gain,
    gain_to_color_code,
    regularize_color,
    remove_color,
)


def _sample_codes(rng, family, batch=16):
    return rng.uniform(-1.0, 1.0, size=(batch, family.n_affine)).astype(np.float32)


@pytest.mark.parametrize("name", list(FAMILIES))
def test_code_params_roundtrip(rng, name):
    family = FAMILIES[name]
    code = _sample_codes(rng, family)
    rec = params_to_code(family, code_to_params(family, code))
    np.testing.assert_allclose(rec, code, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", list(FAMILIES))
def test_matrix_matches_explicit_composition(rng, name):
    """The analytic expansion equals R @ Z @ S @ T built explicitly."""
    family = FAMILIES[name]
    code = _sample_codes(rng, family)
    params = np.asarray(code_to_params(family, code))

    batch = code.shape[0]
    expected = np.zeros((batch, 3, 3))
    for b in range(batch):
        cols = iter(range(params.shape[1]))
        theta = params[b, next(cols)] if family.has_rotation else 0.0
        p = params[b, next(cols)]
        q = params[b, next(cols)] if family.anisotropic else p
        m = params[b, next(cols)] if family.has_skew else 0.0
        n = params[b, next(cols)] if family.has_skew else 0.0
        x = params[b, next(cols)]
        y = params[b, next(cols)]
        R = np.array(
            [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
        )
        Z = np.diag([p, q, 1.0])
        S = np.array([[1, m, 0], [n, 1, 0], [0, 0, 1]])
        T = np.array([[1, 0, x], [0, 1, y], [0, 0, 1]])
        expected[b] = R @ Z @ S @ T

    got = np.asarray(code_to_matrix(family, code))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_inverse_affine_matches_numpy(rng):
    code = _sample_codes(rng, RPQMNXY)
    mat = np.asarray(code_to_matrix(RPQMNXY, code)).astype(np.float64)
    inv = np.asarray(inverse_affine(jnp.asarray(mat)))
    np.testing.assert_allclose(inv, np.linalg.inv(mat), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["pxy", "rp", "rpqxy"])
def test_closed_form_recovery_is_exact_on_pure_matrices(rng, name):
    """matrix_to_params(code_to_matrix(c)) == params(c) for in-family matrices."""
    family = FAMILIES[name]
    code = _sample_codes(rng, family)
    params = code_to_params(family, code)
    mat = code_to_matrix(family, code)
    rec = regularize_matrix(family, mat)
    np.testing.assert_allclose(rec, params, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["pxy", "rp"])
def test_regularize_recovers_relative_code(rng, name):
    """For composition-closed families: given base code a and relative
    code c, the code of M_c @ M_a regularized against a returns c —
    the invariant the dSprites losses rely on (dSprites/rp.py:469-470,
    dSprites/pxy.py:180-182)."""
    family = FAMILIES[name]
    base = _sample_codes(rng, family)
    relative = _sample_codes(rng, family)

    m_base = code_to_matrix(family, base)
    m_rel = code_to_matrix(family, relative)
    m_trans = jnp.matmul(m_rel, m_base)

    # Recover the trans code exactly (closed families only).
    trans_params = regularize_matrix(family, m_trans)
    trans_code = params_to_code(family, trans_params)

    rec = regularize(family, base, trans_code)
    np.testing.assert_allclose(rec, relative, rtol=1e-3, atol=1e-3)


def test_regularize_uses_only_affine_columns(rng):
    """Extra (e.g. color) columns must be ignored (dSprites/utils_rp.py:119-120)."""
    base = _sample_codes(rng, RP)
    extra = np.concatenate([base, np.full((base.shape[0], 3), 7.0, np.float32)], axis=1)
    np.testing.assert_allclose(
        regularize(RP, extra, extra), regularize(RP, base, base), rtol=1e-6
    )


def test_compose_relative_identity(rng):
    code = _sample_codes(rng, RP)
    mat = code_to_matrix(RP, code)
    rel = compose_relative(mat, mat)
    eye = np.broadcast_to(np.eye(3), rel.shape)
    np.testing.assert_allclose(rel, eye, rtol=1e-4, atol=1e-5)


def test_pxy_align_matrix_is_translation_only(rng):
    """Zoom is deliberately dropped (dSprites/utils_pxy.py:83-84)."""
    code = _sample_codes(rng, PXY)
    mat = np.asarray(pxy_align_matrix(code))
    params = np.asarray(code_to_params(PXY, code))
    assert np.allclose(mat[:, 0, 0], 1.0) and np.allclose(mat[:, 1, 1], 1.0)
    np.testing.assert_allclose(mat[:, 0, 2], params[:, 1], rtol=1e-6)
    np.testing.assert_allclose(mat[:, 1, 2], params[:, 2], rtol=1e-6)


@pytest.mark.parametrize("rgb_factor", [0.1, 0.5])
def test_color_roundtrip_and_regularizer(rng, rgb_factor):
    base = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
    rel = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)

    code = gain_to_color_code(color_code_to_gain(jnp.asarray(base), rgb_factor), rgb_factor)
    np.testing.assert_allclose(code, base, rtol=1e-5, atol=1e-6)

    # gain(trans) = gain(rel) * gain(base)  =>  regularize recovers rel
    gain_trans = color_code_to_gain(jnp.asarray(rel), rgb_factor) * color_code_to_gain(
        jnp.asarray(base), rgb_factor
    )
    trans_code = gain_to_color_code(gain_trans, rgb_factor)
    rec = regularize_color(jnp.asarray(base), trans_code, rgb_factor)
    np.testing.assert_allclose(rec, rel, rtol=1e-4, atol=1e-5)


def test_apply_remove_color_roundtrip(rng):
    img = rng.uniform(0, 1, size=(4, 8, 8, 3)).astype(np.float32)
    gain = color_code_to_gain(
        jnp.asarray(rng.uniform(-1, 1, size=(4, 3)).astype(np.float32)), 0.5
    )
    out = remove_color(apply_color(jnp.asarray(img), gain), gain)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)


def test_recovery_stays_finite_on_degenerate_codes(rng):
    """Predicted codes are unbounded during training; degenerate zooms
    (p == 0, det == 0) must not poison the loss with NaN/inf (the
    reference NaNs the whole run here)."""
    import jax

    for family in (PXY, RP, RPQXY):
        base = _sample_codes(rng, family)
        # p-code = -1/pq_factor makes the zoom exactly zero
        sing = base.copy()
        sing[:, 1 if family.has_rotation else 0] = -1.0 / family.pq_factor
        rec = regularize(family, jnp.asarray(sing), jnp.asarray(base))
        assert np.all(np.isfinite(np.asarray(rec))), family.name
        # gradients through the guarded recovery stay finite too
        g = jax.grad(
            lambda t: float(0) + jnp.sum(regularize(family, jnp.asarray(sing), t))
        )(jnp.asarray(base))
        assert np.all(np.isfinite(np.asarray(g))), family.name

    # color ratio with a zero real gain
    zero_gain_code = np.full((4, 3), -2.0, np.float32)  # gain = -2*0.5+1 = 0
    rel = regularize_color(jnp.asarray(zero_gain_code), jnp.ones((4, 3)), 0.5)
    assert np.all(np.isfinite(np.asarray(rel)))


def test_remove_color_survives_zero_gain(rng):
    """Predicted align gains can cross zero mid-training; the aligned
    image must stay finite and bounded (the unguarded division killed a
    colored GAN soak at ~step 650)."""
    img = jnp.asarray(rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32))
    zero_gain = jnp.zeros((2, 3))
    out = remove_color(img, zero_gain)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.abs(np.asarray(out)).max() <= 100.0 + 1e-3
    # normal regime untouched
    gain = jnp.asarray(rng.uniform(0.5, 1.5, (2, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(remove_color(img, gain)),
        np.asarray(img) / np.asarray(gain)[:, None, None, :],
        rtol=1e-6,
    )
