"""Smoke tests: every pipeline's jitted step runs, produces finite
losses, updates parameters, and the simple pretrainers actually learn.
"""

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
from eadgan_tpu.train.config import (
    ApproximatorConfig,
    CelebaConfig,
    MnistConfig,
    PxyConfig,
    SpritesGanConfig,
)
from eadgan_tpu.train.gan_celeba import init_celeba_gan_state, make_celeba_gan_step
from eadgan_tpu.train.gan_dsprites import init_sprites_gan_state, make_sprites_gan_step
from eadgan_tpu.train.gan_mnist import init_mnist_gan_state, make_mnist_gan_step
from eadgan_tpu.train.pretrain import (
    init_approximator_state,
    init_pxy_state,
    make_approximator_step,
    make_pxy_step,
)


# compile-heavy (full GAN-step XLA compiles on CPU): excluded from the
# fast tier — run `pytest -m "not slow"` for a quick signal, the full
# suite remains the merge bar (CLAUDE.md).
pytestmark = pytest.mark.slow


def tree_l2_diff(a, b):
    return sum(
        float(jnp.sum((x - y) ** 2)) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def synth_sprites(rng, batch, size=64):
    """Random soft blobs standing in for dSprites."""
    img = np.zeros((batch, size, size, 1), np.float32)
    ys, xs = np.mgrid[0:size, 0:size]
    for b in range(batch):
        cy, cx = rng.uniform(size * 0.3, size * 0.7, 2)
        r = rng.uniform(4, 10)
        img[b, :, :, 0] = ((ys - cy) ** 2 + (xs - cx) ** 2 < r**2).astype(np.float32)
    return jnp.asarray(img)


def test_approximator_learns():
    config = ApproximatorConfig(batch_size=64)
    model = AffineApproximator()
    state = init_approximator_state(model, config, jax.random.PRNGKey(0))
    step = make_approximator_step(model, config)
    state, first = step(state)
    for _ in range(50):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["affine_loss"]))
    assert float(metrics["affine_loss"]) < float(first["affine_loss"])
    assert int(state.step) == 51


@pytest.mark.parametrize("colored", [False, True])
def test_pxy_step_runs(rng, colored):
    config = PxyConfig(code_dim=6 if colored else 3, colored=colored)
    encoder = SpritesEncoderPxy(out_dim=config.code_dim, channels=3 if colored else 1)
    state = init_pxy_state(encoder, config, jax.random.PRNGKey(0))
    step = make_pxy_step(encoder, config)
    img = synth_sprites(rng, 8)
    p0 = state.model.params
    state, metrics = step(state, img)
    state, metrics = step(state, img)
    assert np.isfinite(float(metrics["affine_loss"]))
    assert tree_l2_diff(p0, state.model.params) > 0


@pytest.mark.parametrize("colored", [False, True])
def test_sprites_gan_step_runs(rng, colored):
    config = SpritesGanConfig(
        code_dim=7 if colored else 4, channels=3 if colored else 1, colored=colored
    )
    channels = 3 if colored else 1
    g = SpritesGenerator(channels=channels)
    d = SpritesDiscriminator(channels=channels)
    e = SpritesEncoder(n_classes=3, code_dim=config.code_dim, channels=channels)
    pxy = SpritesEncoderPxy(out_dim=6 if colored else 3, channels=channels)
    pxy_vars = pxy.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, channels))
    )
    state = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
    step = make_sprites_gan_step(g, d, e, pxy, config)
    img = synth_sprites(rng, 8)

    g0, d0, e0 = state.g.params, state.d.params, state.e.params
    pxy0 = state.pxy.params
    state, metrics = step(state, img)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert tree_l2_diff(g0, state.g.params) > 0
    assert tree_l2_diff(d0, state.d.params) > 0
    assert tree_l2_diff(e0, state.e.params) > 0
    assert tree_l2_diff(pxy0, state.pxy.params) == 0  # frozen


def test_mnist_gan_step_runs(rng):
    config = MnistConfig()
    g, d, e = MnistGenerator(), MnistDiscriminator(), MnistEncoder()
    approx = AffineApproximator()
    approx_vars = approx.init(jax.random.PRNGKey(2), jnp.zeros((1, 6)))
    state = init_mnist_gan_state(g, d, e, approx_vars, config, jax.random.PRNGKey(0))
    step = make_mnist_gan_step(g, d, e, approx, config)

    imgs = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (8,)))
    g0, d0 = state.g.params, state.d.params
    state, metrics = step(state, imgs, labels)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert tree_l2_diff(g0, state.g.params) > 0
    assert tree_l2_diff(d0, state.d.params) > 0
    assert int(state.step) == 1


def test_celeba_gan_step_runs(rng):
    config = CelebaConfig(batch_size=4)
    g, d = CelebaGenerator(), CelebaDiscriminator()
    state = init_celeba_gan_state(g, d, config, jax.random.PRNGKey(0))
    step = make_celeba_gan_step(g, d, config)

    imgs = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    g0, d0 = state.g.params, state.d.params
    state, metrics = step(state, imgs)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert tree_l2_diff(g0, state.g.params) > 0
    assert tree_l2_diff(d0, state.d.params) > 0
