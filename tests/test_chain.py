"""Chained multi-step engine (train/chain.py + cli/common.py):

the in-graph lax.scan window must be step-for-step identical to the
per-dispatch engine — same training trajectory, same RNG streams, same
side-effect steps seeing the same post-step state and batch content.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.cli.common import run_epochs
from eadgan_tpu.data.native import gather_normalize, gather_normalize_flip
from eadgan_tpu.models import SpritesDiscriminator, SpritesEncoder, SpritesEncoderPxy, SpritesGenerator
from eadgan_tpu.train.chain import (
    LazyHostBatch,
    make_chained_step,
    normalize_prepare,
    plan_windows,
)
from eadgan_tpu.train.config import PxyConfig, SpritesGanConfig
from eadgan_tpu.train.gan_dsprites import init_sprites_gan_state, make_sprites_gan_step
from eadgan_tpu.train.pretrain import init_pxy_state, make_pxy_step


# ---------------------------------------------------------------- planner


# compile-heavy (full GAN-step XLA compiles on CPU): excluded from the
# fast tier — run `pytest -m "not slow"` for a quick signal, the full
# suite remains the merge bar (CLAUDE.md).
pytestmark = pytest.mark.slow


def test_plan_windows_covers_range_and_respects_chain():
    plan = list(plan_windows(0, 100, 16, periods=()))
    assert sum(k for _, k in plan) == 100
    assert all(1 <= k <= 16 for _, k in plan)
    # power-of-two window lengths only: each distinct k is a separate
    # XLA compile, so the planner bounds the set to log2(chain)+1
    assert all(k & (k - 1) == 0 for _, k in plan)
    # contiguous
    s = 0
    for start, k in plan:
        assert start == s
        s += k


def test_plan_windows_aligns_events_to_window_ends():
    periods = (10, 25)
    plan = list(plan_windows(0, 100, 16, periods=periods))
    ends = {s + k - 1 for s, k in plan}
    for e in range(100):
        if any(e % p == 0 for p in periods):
            assert e in ends, f"event step {e} not at a window end"
    assert sum(k for _, k in plan) == 100


def test_plan_windows_stop_and_resume_offsets():
    # resumed mid-schedule at step 37, cap at absolute step 50
    plan = list(plan_windows(37, 100, 8, periods=(20,), stop=50))
    assert plan[0][0] == 37
    last_s, last_k = plan[-1]
    assert last_s + last_k == 50
    ends = {s + k - 1 for s, k in plan}
    assert 40 in ends  # 40 % 20 == 0 inside the range


def test_plan_windows_period_one_degenerates_to_single_steps():
    plan = list(plan_windows(0, 10, 16, periods=(1,)))
    assert [k for _, k in plan] == [1] * 10


def test_plan_windows_invariants_fuzz():
    """Randomized sweep of the four planner invariants: contiguous
    coverage of [start, min(start+count, stop)), k in [1, chain] and a
    power of two, and every event index inside the range at a window
    END."""
    rng = np.random.default_rng(0)
    for _ in range(300):
        start = int(rng.integers(0, 1000))
        count = int(rng.integers(1, 400))
        chain = int(rng.integers(1, 65))
        nper = int(rng.integers(0, 3))
        periods = tuple(int(rng.integers(1, 150)) for _ in range(nper))
        stop = int(start + rng.integers(1, count + 1)) if rng.random() < 0.5 else None

        plan = list(plan_windows(start, count, chain, periods, stop))
        end = start + count if stop is None else min(start + count, stop)

        s = start
        for ws, k in plan:
            assert ws == s, "windows not contiguous"
            assert 1 <= k <= chain
            assert k & (k - 1) == 0, "window length not a power of two"
            s += k
        assert s == end, "plan does not cover the range exactly"

        ends = {ws + k - 1 for ws, k in plan}
        for e in range(start, end):
            if any(e % p == 0 for p in periods):
                assert e in ends, f"event {e} not at a window end"


# ------------------------------------------------------------ prepare ops


def test_normalize_prepare_matches_native_batcher():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (40, 8, 6), np.uint8)
    idx = rng.permutation(40)[:10]
    mask = rng.random(10) < 0.5

    host = gather_normalize(data, idx, 1 / 127.5, -1.0)
    prep = normalize_prepare(1 / 127.5, -1.0, flip=False, add_channel=True)
    (dev,) = prep((), jnp.asarray(data[idx]))
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-6, atol=1e-6)

    host_f = gather_normalize_flip(data, idx, mask, 1 / 127.5, -1.0)
    prep_f = normalize_prepare(1 / 127.5, -1.0, flip=True, add_channel=True)
    (dev_f,) = prep_f((), jnp.asarray(data[idx]), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(dev_f), host_f, rtol=1e-6, atol=1e-6)

    # device-resident gather path: indices in, same pixels out
    prep_g = normalize_prepare(
        1 / 127.5, -1.0, flip=True, add_channel=True, gather=True
    )
    (dev_g,) = prep_g(
        (jnp.asarray(data),), jnp.asarray(idx, jnp.int32), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(dev_g), host_f, rtol=1e-6, atol=1e-6)


def test_gather_prepare_labeled():
    from eadgan_tpu.train.chain import gather_prepare

    rng = np.random.default_rng(5)
    imgs = rng.random((30, 4, 4, 1)).astype(np.float32)
    labels = rng.integers(0, 10, 30)
    idx = np.asarray([3, 17, 29, 0], np.int32)
    prep = gather_prepare()
    img_b, lab_b = prep((jnp.asarray(imgs), jnp.asarray(labels)), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(img_b), imgs[idx], rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(lab_b), labels[idx])


def test_lazy_host_batch_materializes_once():
    calls = []

    def fn():
        calls.append(1)
        return np.arange(12).reshape(3, 4)

    lazy = LazyHostBatch(fn)
    assert lazy[1:].shape == (2, 4)
    assert lazy.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(lazy), np.arange(12).reshape(3, 4))
    assert len(calls) == 1


def test_lazy_last_metrics_fetches_once_and_maps_keys():
    from eadgan_tpu.train.chain import LazyLastMetrics

    packed = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    lazy = LazyLastMetrics(("a", "b", "c"), packed)
    assert float(lazy["b"]) == 10.0
    assert float(lazy["a"]) == 9.0
    assert list(lazy.keys()) == ["a", "b", "c"]
    assert dict(lazy.items()) == {"a": 9.0, "b": 10.0, "c": 11.0}
    # dict API parity with the plain metrics dict the per-dispatch
    # engine hands to on_batch
    assert "b" in lazy and "zzz" not in lazy
    assert float(lazy.get("c")) == 11.0
    assert lazy.get("zzz", -1.0) == -1.0
    assert [float(v) for v in lazy.values()] == [9.0, 10.0, 11.0]
    with pytest.raises(KeyError):
        lazy["zzz"]


def test_chained_step_packed_metrics_match_dict():
    """pack_keys returns the same numbers as the dict form, as one
    (K, M) f32 array in the given key order."""
    config, encoder, state = _pxy_setup()
    body = make_pxy_step(encoder, config, jit=False)
    chained_dict = make_chained_step(body, donate=False)
    chained_packed = make_chained_step(
        body, donate=False, pack_keys=("affine_loss",)
    )

    rng = np.random.default_rng(6)
    window = jnp.asarray(rng.random((4, 8, 64, 64, 1)), jnp.float32)

    _, stacked = chained_dict(state, (), window)
    _, packed = chained_packed(state, (), window)
    assert packed.shape == (4, 1)
    assert packed.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(packed)[:, 0], np.asarray(stacked["affine_loss"]),
        rtol=1e-6, atol=0,
    )


def test_chained_step_auto_pack_resolves_all_emitted_keys():
    """pack_keys="auto" packs EVERY metric the body emits (sorted order,
    resolved at trace time) — the production engines rely on this for
    full metric-dict parity with the per-dispatch path."""
    config, encoder, state = _pxy_setup()
    body = make_pxy_step(encoder, config, jit=False)

    def body2(st, img):
        st, m = body(st, img)
        return st, {"z_extra": m["affine_loss"] * 2.0, **m}

    chained = make_chained_step(body2, donate=False, pack_keys="auto")
    assert chained.resolved_pack_keys == []  # resolved only at first trace

    rng = np.random.default_rng(6)
    window = jnp.asarray(rng.random((3, 8, 64, 64, 1)), jnp.float32)
    _, packed = chained(state, (), window)

    assert chained.resolved_pack_keys == ["affine_loss", "z_extra"]
    assert packed.shape == (3, 2)
    rows = np.asarray(packed)
    np.testing.assert_allclose(rows[:, 1], rows[:, 0] * 2.0, rtol=1e-6)


# ------------------------------------------------- chained step == looped


def _pxy_setup(seed=0):
    config = PxyConfig(batch_size=8)
    encoder = SpritesEncoderPxy(out_dim=3, channels=1)
    state = init_pxy_state(encoder, config, jax.random.PRNGKey(seed))
    return config, encoder, state


def test_chained_pxy_step_matches_sequential():
    config, encoder, state = _pxy_setup()
    single = make_pxy_step(encoder, config)  # jitted, copying
    body = make_pxy_step(encoder, config, jit=False)
    chained = make_chained_step(body, donate=False)

    rng = np.random.default_rng(1)
    window = jnp.asarray(rng.random((5, 8, 64, 64, 1)), jnp.float32)

    seq_state = state
    seq_losses = []
    for i in range(5):
        seq_state, m = single(seq_state, window[i])
        seq_losses.append(float(m["affine_loss"]))

    ch_state, stacked = chained(state, (), window)
    np.testing.assert_allclose(
        np.asarray(stacked["affine_loss"]), seq_losses, rtol=2e-5, atol=1e-6
    )
    # The scan body and the per-step jit fuse differently; 1-ulp f32
    # differences pass through Adam's m/(sqrt(v)+eps) (tiny v early in
    # training) and grow a few orders — the tight per-step LOSS match
    # above is the equivalence witness, the state bar below just rules
    # out real divergence (a wrong batch/RNG stream moves params ~1e-2).
    for a, b in zip(jax.tree.leaves(seq_state), jax.tree.leaves(ch_state)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_chained_sprites_gan_step_matches_sequential():
    config = SpritesGanConfig(batch_size=8)
    generator = SpritesGenerator(channels=1)
    discriminator = SpritesDiscriminator(channels=1)
    encoder = SpritesEncoder(n_classes=config.n_classes, code_dim=config.code_dim, channels=1)
    pxy_encoder = SpritesEncoderPxy(out_dim=3, channels=1)
    pxy_vars = pxy_encoder.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    state = init_sprites_gan_state(
        generator, discriminator, encoder, pxy_encoder, pxy_vars, config,
        jax.random.PRNGKey(0),
    )
    single = make_sprites_gan_step(generator, discriminator, encoder, pxy_encoder, config)
    body = make_sprites_gan_step(generator, discriminator, encoder, pxy_encoder, config, jit=False)
    # uint8 window + in-graph normalize, as the chained CLI path ships it
    prepare = normalize_prepare(1.0, 0.0, flip=False, add_channel=True)
    chained = make_chained_step(body, prepare=prepare, donate=False)

    rng = np.random.default_rng(2)
    win_u8 = rng.integers(0, 2, (3, 8, 64, 64), np.uint8)

    seq_state = state
    seq = {"d_loss": [], "g_loss": [], "cat_loss": [], "cont_loss": []}
    for i in range(3):
        img = gather_normalize(win_u8[i], np.arange(8))
        seq_state, m = single(seq_state, jnp.asarray(img))
        for k in seq:
            seq[k].append(float(m[k]))

    ch_state, stacked = chained(state, (), jnp.asarray(win_u8))
    for k in seq:
        np.testing.assert_allclose(
            np.asarray(stacked[k]), seq[k], rtol=2e-4, atol=1e-5
        )
    for a, b in zip(jax.tree.leaves(seq_state), jax.tree.leaves(ch_state)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )


# ---------------------------------------------- full engine equivalence


def _run_engine(chain, events, data, seed=0, max_steps=12, flip=False, resident=True):
    config, encoder, state = _pxy_setup(seed=7)
    step = make_pxy_step(encoder, config)
    body = make_pxy_step(encoder, config, jit=False)

    def on_batch(batches_done, state, metrics, batch):
        if batches_done % 4 == 0:
            # materialize the batch exactly like the sample callbacks do
            events.append(
                (batches_done, np.asarray(batch[0][:2]).copy(),
                 float(metrics["affine_loss"]))
            )

    import os

    os.environ["EADGAN_DEVICE_DATA_MAX"] = str((4 << 30) if resident else 0)
    try:
        final = run_epochs(
            n_epochs=50,
            data=data,
            labels=None,
            batch_size=8,
            state=state,
            step_fn=step,
            on_batch=on_batch,
            seed=seed,
            max_steps=max_steps,
            scale=1.0 / 127.5,
            shift=-1.0,
            random_flip=flip,
            # explicit key -> the packed (K, M) chained-metric path, as
            # every production CLI now runs it; on_batch's metric read
            # goes through LazyLastMetrics
            metric_keys=["affine_loss"],
            chain=chain,
            chain_periods=(4,),
            step_body=body,
        )
    finally:
        os.environ.pop("EADGAN_DEVICE_DATA_MAX", None)
    return jax.device_get(final)


@pytest.mark.parametrize(
    "flip,resident",
    [(False, True), (True, True), (True, False)],
    ids=["gather", "gather-flip", "hostwin-flip"],
)
def test_run_epochs_chained_matches_per_step_engine(flip, resident):
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (40, 64, 64), np.uint8)

    ev1, ev5 = [], []
    s1 = _run_engine(1, ev1, data, flip=flip)
    s5 = _run_engine(5, ev5, data, flip=flip, resident=resident)

    # same side-effect steps, same post-step batch content, and a tight
    # per-event loss trajectory (the chaos-free equivalence witness)
    assert [e[0] for e in ev1] == [e[0] for e in ev5]
    for (i, b1, l1), (_, b5, l5) in zip(ev1, ev5):
        np.testing.assert_allclose(b1, b5, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(l1, l5, rtol=2e-3, atol=1e-5)

    # final state: fusion-difference amplification bar (see the chained
    # step tests above)
    assert int(s1.step) == int(s5.step) == 12
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s5)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3
        )


def test_run_epochs_chained_on_batch_sees_all_metrics():
    """on_batch must see the step's FULL metric dict under chaining —
    metric_keys only filters what the logger prints (same contract as
    the per-dispatch engine, which passes metrics through untouched)."""
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, (40, 64, 64), np.uint8)
    config, encoder, state = _pxy_setup(seed=7)

    def widen(step):
        def wrapped(st, img):
            st, m = step(st, img)
            return st, {"z_extra": m["affine_loss"] * 2.0, **m}

        return wrapped

    def run(chain, step_fn, body, reads):
        def on_batch(batches_done, st, metrics, batch):
            if batches_done % 4 == 0:
                # a key the CLI does NOT print — must still be readable
                reads.append((batches_done, float(metrics["z_extra"])))

        return run_epochs(
            n_epochs=50, data=data, labels=None, batch_size=8,
            state=state, step_fn=step_fn, on_batch=on_batch, seed=0,
            max_steps=8, scale=1.0 / 127.5, shift=-1.0,
            metric_keys=["affine_loss"], chain=chain, chain_periods=(4,),
            step_body=body,
        )

    jitted = jax.jit(widen(make_pxy_step(encoder, config, jit=False)))
    body = widen(make_pxy_step(encoder, config, jit=False))
    r1, r4 = [], []
    run(1, jitted, body, r1)
    run(4, jitted, body, r4)
    assert [s for s, _ in r1] == [s for s, _ in r4] != []
    for (_, a), (_, b) in zip(r1, r4):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_run_epochs_chained_data_parallel_matches():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, (64, 64, 64), np.uint8)

    ev1, ev5 = [], []
    s1 = _run_engine(1, ev1, data, max_steps=8)
    # chained + sharded over the 8 virtual devices
    config, encoder, state = _pxy_setup(seed=7)
    body = make_pxy_step(encoder, config, jit=False)
    s5 = run_epochs(
        n_epochs=50,
        data=data,
        labels=None,
        batch_size=8,
        state=state,
        step_fn=make_pxy_step(encoder, config),
        on_batch=lambda *a: None,
        seed=0,
        max_steps=8,
        scale=1.0 / 127.5,
        shift=-1.0,
        # packed (K, M) metric path under DP: the stacked array is a
        # replicated sharded array; the single drain fetch must handle it
        metric_keys=["affine_loss"],
        data_parallel=True,
        chain=4,
        chain_periods=(4,),
        step_body=body,
    )
    s5 = jax.device_get(s5)
    assert int(s1.step) == int(s5.step) == 8
    # DP adds psum reduction-order ulps on top of the fusion-difference
    # amplification; Adam moment leaves near zero need the atol headroom
    # (test_parallel pins one-step DP strictly at rtol 2e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s5)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=3e-3
        )


# ----------------------------------------------- async event side effects


def test_event_worker_orders_and_propagates():
    from eadgan_tpu.train.chain import EventWorker

    seen = []
    w = EventWorker()
    for i in range(5):
        w.submit(lambda i=i: seen.append(i))
    w.close()
    assert seen == [0, 1, 2, 3, 4]

    w = EventWorker()
    w.submit(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        w.close()


def test_run_epochs_chained_async_event_state_snapshot():
    """Event callbacks run on the background EventWorker with a
    device-side SNAPSHOT of the train state, so reading state leaves
    inside the callback AFTER later windows have donated the live
    buffers must still work — and must yield the exact post-step values
    the per-dispatch engine sees at the same steps."""
    import time

    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, (64, 64, 64), np.uint8)

    def leaf(state):
        return jax.tree.leaves(state.model.params)[0]

    def run(chain, reads):
        config, encoder, state = _pxy_setup(seed=7)
        step_fn = make_pxy_step(encoder, config)
        body = make_pxy_step(encoder, config, jit=False)

        def on_batch(batches_done, st, metrics, batch):
            if batches_done % 4 == 0:
                # let the engine race ahead (donating the live state)
                # before the leaves are read — only a snapshot survives
                time.sleep(0.05)
                reads.append((batches_done, np.asarray(leaf(st)).copy()))

        run_epochs(
            n_epochs=50, data=data, labels=None, batch_size=8,
            state=state, step_fn=step_fn, on_batch=on_batch, seed=0,
            max_steps=12, scale=1.0 / 127.5, shift=-1.0,
            metric_keys=["affine_loss"], chain=chain, chain_periods=(4,),
            step_body=body,
        )

    r1, r4 = [], []
    run(1, r1)
    run(4, r4)
    assert [s for s, _ in r1] == [s for s, _ in r4] != []
    for (_, a), (_, b) in zip(r1, r4):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_resolve_compute_dtype():
    """--compute resolution: explicit flag wins; unset defaults by
    backend (f32 on the CPU test backend); bf16 selects the fast warp
    unless EADGAN_WARP_PRECISION is already pinned."""
    import argparse
    import os

    from eadgan_tpu.cli.common import resolve_compute_dtype

    ns = argparse.Namespace(compute=None)
    assert resolve_compute_dtype(ns) is None  # CPU backend -> f32

    saved = os.environ.pop("EADGAN_WARP_PRECISION", None)
    try:
        assert resolve_compute_dtype(argparse.Namespace(compute="bf16")) is jnp.bfloat16
        assert os.environ["EADGAN_WARP_PRECISION"] == "fast"
        os.environ["EADGAN_WARP_PRECISION"] = "highest"
        assert resolve_compute_dtype(argparse.Namespace(compute="bf16")) is jnp.bfloat16
        assert os.environ["EADGAN_WARP_PRECISION"] == "highest"  # respected
        os.environ.pop("EADGAN_WARP_PRECISION", None)
        assert resolve_compute_dtype(argparse.Namespace(compute="f32")) is None
        assert "EADGAN_WARP_PRECISION" not in os.environ
    finally:
        if saved is not None:
            os.environ["EADGAN_WARP_PRECISION"] = saved
        else:
            os.environ.pop("EADGAN_WARP_PRECISION", None)


def test_run_epochs_chained_no_periods_legacy_callback():
    """Callers that declare NO chain_periods keep the legacy contract:
    on_batch fires inline once per window (with the live state), not
    event-gated."""
    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, (64, 64, 64), np.uint8)
    config, encoder, state = _pxy_setup(seed=7)
    body = make_pxy_step(encoder, config, jit=False)
    calls = []

    run_epochs(
        n_epochs=50, data=data, labels=None, batch_size=8,
        state=state, step_fn=make_pxy_step(encoder, config),
        on_batch=lambda bd, *a: calls.append(bd), seed=0,
        max_steps=8, scale=1.0 / 127.5, shift=-1.0,
        metric_keys=["affine_loss"], chain=4, chain_periods=(),
        step_body=body,
    )
    # windows of 4 -> callback at each window's last step index
    assert calls == [3, 7]
