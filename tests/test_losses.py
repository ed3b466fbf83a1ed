"""Golden tests for the loss functions against torch equivalents."""

import numpy as np
import pytest
import jax.numpy as jnp

from eadgan_tpu.losses import bce_loss, mse_loss, mutual_info_loss, torch_cross_entropy

torch = pytest.importorskip("torch")


def test_mse_matches_torch(rng):
    a = rng.normal(size=(8, 5)).astype(np.float32)
    b = rng.normal(size=(8, 5)).astype(np.float32)
    expected = torch.nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    np.testing.assert_allclose(float(mse_loss(jnp.asarray(a), jnp.asarray(b))), expected, rtol=1e-6)


def test_bce_matches_torch(rng):
    p = rng.uniform(1e-4, 1 - 1e-4, size=(16, 1)).astype(np.float32)
    t = (rng.uniform(size=(16, 1)) > 0.5).astype(np.float32)
    expected = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    np.testing.assert_allclose(float(bce_loss(jnp.asarray(p), jnp.asarray(t))), expected, rtol=1e-5)


def test_bce_extreme_probs_finite_values_and_grads():
    """Exactly-saturated sigmoids must give finite loss AND finite
    gradients (the masked-log formulation NaN'd a GAN soak)."""
    import jax

    p = jnp.asarray([[0.0], [1.0], [0.5]])
    t = jnp.asarray([[1.0], [0.0], [1.0]])
    out = float(bce_loss(p, t))
    assert np.isfinite(out)

    g = jax.grad(lambda q: bce_loss(q, t))(p)
    assert np.all(np.isfinite(np.asarray(g)))

    # and through a saturating sigmoid, as in the GAN steps
    logits = jnp.asarray([[-200.0], [200.0], [0.0]])
    g2 = jax.grad(lambda l: bce_loss(jax.nn.sigmoid(l), t))(logits)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_cross_entropy_matches_torch_on_softmax_input(rng):
    """The MNIST quirk: CE applied to already-softmaxed probabilities."""
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, 10, size=(8,))
    expected = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(probs), torch.from_numpy(labels)
    ).item()
    got = float(torch_cross_entropy(jnp.asarray(probs), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_mutual_info_loss_reference_formula(rng):
    c_given_x = rng.uniform(0.01, 1, size=(8, 3)).astype(np.float32)
    c_given_x /= c_given_x.sum(-1, keepdims=True)
    c = np.eye(3, dtype=np.float32)[rng.integers(0, 3, size=(8,))]
    eps = 1e-8
    expected = np.mean(-np.sum(np.log(c_given_x + eps) * c, -1)) + np.mean(
        -np.sum(np.log(c + eps) * c, -1)
    )
    got = float(mutual_info_loss(jnp.asarray(c_given_x), jnp.asarray(c)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
