"""Golden tests: STN warp vs torch F.affine_grid/F.grid_sample.

torch (CPU build, in the image) with ``align_corners=False`` — the
torch-1.7-era default the reference runs under — is the ground truth
(SURVEY.md hard part #1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eadgan_tpu.ops import warp_affine
from eadgan_tpu.transforms import RP, RPQMNXY, code_to_matrix

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_warp(img_nchw, theta_23, padding_mode):
    t_img = torch.from_numpy(img_nchw)
    t_theta = torch.from_numpy(theta_23)
    grid = F.affine_grid(t_theta, t_img.size(), align_corners=False)
    out = F.grid_sample(
        t_img, grid, padding_mode=padding_mode, align_corners=False
    )
    return out.numpy()


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("size", [(2, 1, 32, 32), (3, 3, 64, 64)])
def test_warp_matches_torch(rng, padding_mode, size):
    n, c, h, w = size
    img = rng.uniform(0, 1, size=size).astype(np.float32)
    code = rng.uniform(-1, 1, size=(n, 4)).astype(np.float32)
    matrix = np.asarray(code_to_matrix(RP, jnp.asarray(code)))

    expected = _torch_warp(img, matrix[:, :2, :], padding_mode)

    img_nhwc = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    got = warp_affine(img_nhwc, jnp.asarray(matrix), padding_mode=padding_mode)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))

    np.testing.assert_allclose(got_nchw, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_warp_matches_torch_extreme_transforms(rng, padding_mode):
    """Large zooms/skews push sampling far out of bounds — exercises the
    padding paths hard."""
    n, c, h, w = 4, 1, 16, 16
    img = rng.uniform(0, 1, size=(n, c, h, w)).astype(np.float32)
    code = (rng.uniform(-1, 1, size=(n, 7)) * 3.0).astype(np.float32)
    matrix = np.asarray(code_to_matrix(RPQMNXY, jnp.asarray(code)))

    expected = _torch_warp(img, matrix[:, :2, :], padding_mode)
    img_nhwc = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    got = warp_affine(img_nhwc, jnp.asarray(matrix), padding_mode=padding_mode)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, expected, rtol=1e-4, atol=1e-5)


def test_identity_warp_is_identity(rng):
    img = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    out = warp_affine(jnp.asarray(img), eye)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_warp_gradients_finite(rng):
    import jax

    img = jnp.asarray(rng.uniform(0, 1, size=(2, 16, 16, 1)).astype(np.float32))
    code = jnp.asarray(rng.uniform(-1, 1, size=(2, 4)).astype(np.float32))

    def loss(code):
        mat = code_to_matrix(RP, code)
        return jnp.sum(warp_affine(img, mat) ** 2)

    g = jax.grad(loss)(code)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.linalg.norm(np.asarray(g)) > 0
