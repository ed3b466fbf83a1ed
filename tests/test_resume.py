"""Checkpoint/resume correctness: training N steps, saving, restoring,
and continuing M steps must match an uninterrupted N+M-step run exactly
(the full train state — params, all Adam moments, SN vectors, BN
running stats, PRNG — round-trips through serialization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.models import SpritesEncoderPxy
from eadgan_tpu.train.checkpoint import restore_pytree, save_pytree
from eadgan_tpu.train.config import PxyConfig
from eadgan_tpu.train.pretrain import init_pxy_state, make_pxy_step


def test_resume_bit_exact(tmp_path, rng):
    config = PxyConfig()
    encoder = SpritesEncoderPxy()
    step = make_pxy_step(encoder, config)
    img = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 1)).astype(np.float32))

    # straight run: 5 steps
    state = init_pxy_state(encoder, config, jax.random.PRNGKey(0))
    straight = state
    for _ in range(5):
        straight, _ = step(straight, img)

    # interrupted run: 2 steps, save, restore, 3 more
    inter = state
    for _ in range(2):
        inter, _ = step(inter, img)
    path = str(tmp_path / "state.ckpt")
    save_pytree(path, inter)

    template = init_pxy_state(encoder, config, jax.random.PRNGKey(0))
    restored = restore_pytree(path, template)
    for _ in range(3):
        restored, _ = step(restored, img)

    assert int(restored.step) == int(straight.step) == 5
    # every leaf of the full state: params, Adam moments, stats, rng, step
    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpointer_roundtrip(tmp_path, rng):
    """Orbax-managed async train-state checkpointing: save N steps,
    restore the latest, continue — matches the uninterrupted run."""
    pytest.importorskip("orbax.checkpoint")
    from eadgan_tpu.train.orbax_io import OrbaxCheckpointer

    config = PxyConfig()
    encoder = SpritesEncoderPxy()
    step = make_pxy_step(encoder, config)
    img = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 1)).astype(np.float32))

    state = init_pxy_state(encoder, config, jax.random.PRNGKey(0))
    straight = state
    for _ in range(4):
        straight, _ = step(straight, img)

    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), async_save=True)
    inter = state
    for i in range(2):
        inter, _ = step(inter, img)
        ckpt.save(int(inter.step), inter)
    ckpt.wait()
    assert ckpt.latest_step() == 2

    template = init_pxy_state(encoder, config, jax.random.PRNGKey(0))
    restored = ckpt.restore(template)
    ckpt.close()
    for _ in range(2):
        restored, _ = step(restored, img)

    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
