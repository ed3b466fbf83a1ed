"""Shape, parameter-count, and state-collection tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.models import (
    AffineApproximator,
    CelebaDiscriminator,
    CelebaGenerator,
    MnistDiscriminator,
    MnistEncoder,
    MnistGenerator,
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)


def conv_p(cin, cout, k):
    return cin * cout * k * k + cout


def dense_p(fin, fout):
    return fin * fout + fout


def bn_p(c):
    return 2 * c


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_approximator(key):
    model = AffineApproximator()
    var = model.init(key, jnp.zeros((2, 6)))
    out = model.apply(var, jnp.zeros((2, 6)))
    assert out.shape == (2, 7)
    expected = dense_p(6, 256) + 3 * dense_p(256, 256) + dense_p(256, 7)
    assert n_params(var["params"]) == expected


def test_mnist_generator(key):
    model = MnistGenerator()
    noise = jnp.zeros((2, 62))
    labels = jnp.zeros((2, 10))
    code = jnp.zeros((2, 7))
    var = model.init(key, noise, labels, code)
    out, _ = model.apply(var, noise, labels, code, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 1)
    expected = (
        dense_p(79, 128 * 64)
        + bn_p(128)
        + conv_p(128, 128, 3)
        + bn_p(128)
        + conv_p(128, 64, 3)
        + bn_p(64)
        + conv_p(64, 1, 3)
    )
    assert n_params(var["params"]) == expected


def test_mnist_discriminator(key):
    model = MnistDiscriminator()
    img = jnp.zeros((2, 32, 32, 1))
    var = model.init(key, img)
    out, _ = model.apply(var, img, mutable=["batch_stats"])
    assert out.shape == (2, 1)
    assert "batch_stats" in var  # spectral-norm u/sigma state
    expected = (
        conv_p(1, 16, 3)
        + conv_p(16, 32, 3)
        + conv_p(32, 64, 3)
        + conv_p(64, 128, 3)
        + dense_p(512, 1)
    )
    assert n_params(var["params"]) == expected


def test_mnist_encoder(key):
    model = MnistEncoder()
    img = jnp.zeros((2, 32, 32, 1))
    var = model.init(key, img)
    (label, code, noise), _ = model.apply(var, img, mutable=["batch_stats"])
    assert label.shape == (2, 10) and code.shape == (2, 7) and noise.shape == (2, 62)
    np.testing.assert_allclose(np.sum(np.asarray(label), -1), 1.0, rtol=1e-5)
    expected = (
        conv_p(1, 16, 3)
        + conv_p(16, 32, 3)
        + bn_p(32)
        + conv_p(32, 64, 3)
        + bn_p(64)
        + conv_p(64, 128, 3)
        + bn_p(128)
        + dense_p(512, 10)
        + dense_p(512, 7)
        + dense_p(512, 62)
    )
    assert n_params(var["params"]) == expected


@pytest.mark.parametrize("channels,out_dim", [(1, 3), (3, 6)])
def test_sprites_encoder_pxy(key, channels, out_dim):
    model = SpritesEncoderPxy(out_dim=out_dim, channels=channels)
    img = jnp.zeros((2, 64, 64, channels))
    var = model.init(key, img)
    out = model.apply(var, img)
    assert out.shape == (2, out_dim)
    expected = (
        conv_p(channels, 32, 4)
        + conv_p(32, 32, 4)
        + conv_p(32, 64, 4)
        + conv_p(64, 64, 4)
        + dense_p(1024, out_dim)
    )
    assert n_params(var["params"]) == expected


@pytest.mark.parametrize("channels,in_dim", [(1, 7), (3, 10)])
def test_sprites_generator(key, channels, in_dim):
    model = SpritesGenerator(channels=channels)
    z_c = jnp.zeros((2, in_dim))
    var = model.init(key, z_c)
    out, _ = model.apply(var, z_c, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, channels)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1
    expected = (
        dense_p(in_dim, 128)
        + dense_p(128, 1024)
        + 3 * (conv_p(64, 64, 4) + bn_p(64))
        + conv_p(64, channels, 4)
    )
    assert n_params(var["params"]) == expected


@pytest.mark.parametrize("channels", [1, 3])
def test_sprites_discriminator(key, channels):
    model = SpritesDiscriminator(channels=channels)
    img = jnp.zeros((2, 64, 64, channels))
    var = model.init(key, img)
    out, _ = model.apply(var, img, mutable=["batch_stats"])
    assert out.shape == (2, 1)
    assert 0 <= float(out.min()) and float(out.max()) <= 1


@pytest.mark.parametrize("n_classes,code_dim,channels", [(3, 4, 1), (3, 7, 3)])
def test_sprites_encoder(key, n_classes, code_dim, channels):
    model = SpritesEncoder(n_classes=n_classes, code_dim=code_dim, channels=channels)
    img = jnp.zeros((2, 64, 64, channels))
    var = model.init(key, img)
    (cat, cont), _ = model.apply(var, img, mutable=["batch_stats"])
    assert cat.shape == (2, n_classes) and cont.shape == (2, code_dim)
    np.testing.assert_allclose(np.sum(np.asarray(cat), -1), 1.0, rtol=1e-5)


def test_celeba_generator(key):
    model = CelebaGenerator()
    noise = jnp.zeros((2, 200))
    labels = jnp.zeros((2, 10))
    code = jnp.zeros((2, 8))
    var = model.init(key, noise, labels, code)
    out, _ = model.apply(var, noise, labels, code, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, 3)
    expected = (
        conv_p(218, 1024, 4)
        + conv_p(1024, 512, 4)
        + bn_p(512)
        + conv_p(512, 256, 4)
        + bn_p(256)
        + conv_p(256, 128, 4)
        + bn_p(128)
        + conv_p(128, 3, 4)
    )
    assert n_params(var["params"]) == expected


def test_celeba_discriminator(key):
    model = CelebaDiscriminator()
    img = jnp.zeros((2, 64, 64, 3))
    var = model.init(key, img)
    (cat, cont, validity), _ = model.apply(var, img, mutable=["batch_stats"])
    assert cat.shape == (2, 10) and cont.shape == (2, 8) and validity.shape == (2,)
    np.testing.assert_allclose(np.sum(np.asarray(cat), -1), 1.0, rtol=1e-5)
    expected = (
        conv_p(3, 128, 4)
        + conv_p(128, 256, 4)
        + conv_p(256, 512, 4)
        + conv_p(512, 1024, 4)
        + conv_p(1024, 19, 4)
    )
    assert n_params(var["params"]) == expected


def test_spectral_norm_updates_u(key):
    """Power-iteration state must change across calls with update_stats=True
    and stay fixed with update_stats=False (torch train/eval parity)."""
    model = MnistDiscriminator()
    img = jax.random.uniform(key, (4, 32, 32, 1))
    var = model.init(key, img)
    _, upd1 = model.apply(var, img, train=True, mutable=["batch_stats"])
    changed = jax.tree.map(
        lambda a, b: not np.allclose(a, b), var["batch_stats"], upd1["batch_stats"]
    )
    assert any(jax.tree.leaves(changed))

    _, upd2 = model.apply(var, img, train=False, mutable=["batch_stats"])
    flat_before = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(var["batch_stats"])[0]
    }
    flat_after = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(upd2["batch_stats"])[0]
    }
    for name, before in flat_before.items():
        if name.endswith("/u']"):
            np.testing.assert_allclose(flat_after[name], before)
