"""State-donation semantics of the train-step factories.

``donate=True`` (what the CLIs use) updates the carried train state in
place on device — the caller's pre-step buffers are deleted, halving
step memory. The default keeps the functional no-surprises semantics
tests and library users rely on. Donation is enforced on the CPU
backend too, so both contracts are testable here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.models import (
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)
from eadgan_tpu.train.config import SpritesGanConfig
from eadgan_tpu.train.gan_dsprites import (
    init_sprites_gan_state,
    make_sprites_gan_step,
)


# compile-heavy (full GAN-step XLA compiles on CPU): excluded from the
# fast tier — run `pytest -m "not slow"` for a quick signal, the full
# suite remains the merge bar (CLAUDE.md).
pytestmark = pytest.mark.slow


def _setup(donate):
    config = SpritesGanConfig(batch_size=8)
    g, d, e, pxy = (
        SpritesGenerator(),
        SpritesDiscriminator(),
        SpritesEncoder(),
        SpritesEncoderPxy(),
    )
    pxy_vars = pxy.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    state = init_sprites_gan_state(
        g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0)
    )
    step = make_sprites_gan_step(g, d, e, pxy, config, donate=donate)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 64, 64, 1)), jnp.float32)
    return state, step, img


def test_default_step_preserves_input_state():
    state, step, img = _setup(donate=False)
    old_leaf = jax.tree_util.tree_leaves(state.g.params)[0]
    new_state, metrics = step(state, img)
    # the pre-step buffers stay readable (functional semantics)
    np.asarray(old_leaf)
    assert np.isfinite(float(metrics["d_loss"]))


def test_donated_step_consumes_input_state():
    state, step, img = _setup(donate=True)
    old_leaf = jax.tree_util.tree_leaves(state.g.params)[0]
    new_state, metrics = step(state, img)
    assert np.isfinite(float(metrics["d_loss"]))
    # new state fully usable — chain a second step through it
    newer, metrics2 = step(new_state, img)
    assert np.isfinite(float(metrics2["d_loss"]))
    # the donated input buffer is gone
    with pytest.raises(Exception, match="[Dd]elet|[Dd]onat"):
        np.asarray(old_leaf)


def test_donated_and_default_steps_agree():
    state_a, step_a, img = _setup(donate=False)
    state_b, step_b, _ = _setup(donate=True)
    a, ma = step_a(state_a, img)
    b, mb = step_b(state_b, img)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]), rtol=1e-6, err_msg=k)
