"""Checkpoint/resume correctness: training N steps, saving, restoring,
and continuing M steps must match an uninterrupted N+M-step run exactly
(the full train state — params, all Adam moments, SN vectors, BN
running stats, PRNG — round-trips through serialization)."""

import os

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


@pytest.mark.slow
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


def test_save_is_atomic(tmp_path, monkeypatch):
    """save_pytree never exposes a partial file at the final path: the
    bytes are fully written (and fsynced) to a temp file before the
    os.replace — so a kill at ANY instant leaves either the previous
    complete file or the new complete file, never a truncation.  Pinned
    by intercepting os.replace and checking the temp file is already
    complete, and that no temp litter survives."""
    import eadgan_tpu.train.checkpoint as ckpt
    from flax import serialization

    tree = {"a": np.arange(1000, dtype=np.float32), "b": np.float32(3.0)}
    expected = serialization.to_bytes(tree)
    path = str(tmp_path / "train_state_5.ckpt")
    seen = {}

    real_replace = os.replace

    def spy_replace(src, dst):
        with open(src, "rb") as f:
            seen["bytes"] = f.read()
        seen["src"], seen["dst"] = src, dst
        real_replace(src, dst)

    monkeypatch.setattr(os, "replace", spy_replace)
    ckpt.save_pytree(path, tree)

    assert seen["dst"] == path
    assert seen["src"].startswith(path + ".tmp.")
    assert seen["bytes"] == expected  # temp was COMPLETE before the rename
    with open(path, "rb") as f:
        assert f.read() == expected
    assert [n for n in os.listdir(tmp_path) if ".tmp." in n] == []


def test_restore_latest_falls_back_on_corrupt_newest(tmp_path, capsys):
    """A truncated newest checkpoint (pre-atomic-writer crash, disk
    damage) must not wedge --resume auto: restore_latest skips it with
    a warning and restores the newest LOADABLE one."""
    from eadgan_tpu.train import checkpoint as ckpt

    tree = {"w": np.arange(64, dtype=np.float32)}
    good = {"w": np.arange(64, dtype=np.float32) * 2.0}
    ckpt.save_pytree(str(tmp_path / "train_state_100.ckpt"), tree)
    ckpt.save_pytree(str(tmp_path / "train_state_200.ckpt"), good)
    # newest file: a mid-write truncation at the final path
    full = open(tmp_path / "train_state_200.ckpt", "rb").read()
    with open(tmp_path / "train_state_300.ckpt", "wb") as f:
        f.write(full[: len(full) // 2])

    template = {"w": np.zeros(64, dtype=np.float32)}
    restored, step = ckpt.restore_latest(str(tmp_path), "train_state", template)
    assert step == 200
    np.testing.assert_array_equal(restored["w"], good["w"])
    err = capsys.readouterr().err
    assert "train_state_300.ckpt failed to load" in err

    # all files corrupt -> (template, -1), never an exception
    for name in ("train_state_100.ckpt", "train_state_200.ckpt"):
        with open(tmp_path / name, "wb") as f:
            f.write(b"\x00")
    restored, step = ckpt.restore_latest(str(tmp_path), "train_state", template)
    assert step == -1
    np.testing.assert_array_equal(restored["w"], template["w"])


def test_prune_saved_retention(tmp_path):
    """save_train_state(keep=N) prunes to the N newest train-state
    files; keep=0 keeps everything; reference-contract model files in
    the same directory are untouched (different prefix/suffix)."""
    from eadgan_tpu.train import checkpoint as ckpt

    tree = {"w": np.arange(8, dtype=np.float32)}
    ckpt.save_pytree(str(tmp_path / "checkpoint_100.tar"), tree)  # contract file
    for step in (100, 200, 300):
        ckpt.save_train_state(str(tmp_path), "s_train_state", step, tree, keep=0)
    assert ckpt.saved_steps(str(tmp_path), "s_train_state") == [300, 200, 100]

    path = ckpt.save_train_state(str(tmp_path), "s_train_state", 400, tree, keep=2)
    assert path.endswith("s_train_state_400.ckpt")
    assert ckpt.saved_steps(str(tmp_path), "s_train_state") == [400, 300]
    assert os.path.exists(tmp_path / "checkpoint_100.tar")  # never pruned

    # keep=2 retains a fallback: corrupt the newest, restore falls back
    with open(tmp_path / "s_train_state_400.ckpt", "wb") as f:
        f.write(b"bad")
    restored, step = ckpt.restore_latest(
        str(tmp_path), "s_train_state", {"w": np.zeros(8, dtype=np.float32)}
    )
    assert step == 300
    np.testing.assert_array_equal(restored["w"], tree["w"])

    # pruning a missing file is tolerated (concurrent prune)
    assert ckpt.prune_saved(str(tmp_path), "absent", keep=1) == []


def test_prune_anchors_to_current_step_after_fallback(tmp_path):
    """Retention after a corrupt-newest fallback: the stale higher-step
    file from the abandoned timeline must not occupy a keep slot or —
    at keep=1 — cause the just-written lower-step checkpoint to be
    deleted.  save_train_state anchors pruning to the step it wrote:
    stale-future files go first, the new file is always retained."""
    from eadgan_tpu.train import checkpoint as ckpt

    tree = {"w": np.arange(4, dtype=np.float32)}
    # life 1 reached step 400 but left it corrupt; life 2 resumed at 300
    with open(tmp_path / "s_400.ckpt", "wb") as f:
        f.write(b"corrupt")
    ckpt.save_pytree(str(tmp_path / "s_300.ckpt"), tree)

    # life 2's first save after the fallback
    ckpt.save_train_state(str(tmp_path), "s", 310, tree, keep=1)
    assert ckpt.saved_steps(str(tmp_path), "s") == [310]  # 400 AND 300 pruned

    restored, step = ckpt.restore_latest(
        str(tmp_path), "s", {"w": np.zeros(4, dtype=np.float32)}
    )
    assert step == 310  # --resume auto now finds the live timeline


def test_tmp_orphan_cleanup(tmp_path):
    """A kill during a write skips ``finally`` and orphans
    ``<path>.tmp.<pid>``: re-saving the same path removes it, and
    prune_saved sweeps dead-pid orphans for the prefix.  A tmp owned by
    a LIVE pid is left alone."""
    from eadgan_tpu.train import checkpoint as ckpt

    tree = {"w": np.arange(4, dtype=np.float32)}
    final = tmp_path / "s_100.ckpt"
    dead_pid = 4_000_000  # > kernel.pid_max default: never a live process
    orphan = tmp_path / f"s_100.ckpt.tmp.{dead_pid}"
    orphan.write_bytes(b"partial")

    ckpt.save_pytree(str(final), tree)  # same-path cleanup
    assert not orphan.exists() and final.exists()

    # prefix-level sweep (a step never re-reached): dead pid removed,
    # live pid (ours) kept
    (tmp_path / f"s_50.ckpt.tmp.{dead_pid}").write_bytes(b"partial")
    live = tmp_path / f"s_60.ckpt.tmp.{os.getpid()}"
    live.write_bytes(b"inflight")
    removed = ckpt.prune_saved(str(tmp_path), "s", keep=5)
    assert str(tmp_path / f"s_50.ckpt.tmp.{dead_pid}") in removed
    assert live.exists()
    live.unlink()


def test_maybe_resume_auto_skips_corrupt_newest(tmp_path, capsys):
    """The CLI path end-to-end: --resume auto on a dir whose newest
    checkpoint is truncated restores the previous one."""
    from eadgan_tpu.cli.common import maybe_resume
    from eadgan_tpu.train import checkpoint as ckpt

    good = {"w": np.full(8, 7.0, dtype=np.float32)}
    ckpt.save_pytree(str(tmp_path / "s_10.ckpt"), good)
    with open(tmp_path / "s_20.ckpt", "wb") as f:
        f.write(b"truncated")

    template = {"w": np.zeros(8, dtype=np.float32)}
    out = maybe_resume(template, "auto", str(tmp_path), "s")
    np.testing.assert_array_equal(out["w"], good["w"])
    assert "restoring" in capsys.readouterr().out


def test_fault_kill_mid_write_hook(tmp_path):
    """The drill hook (EADGAN_FAULT_KILL_SAVE_STEP): in a subprocess,
    saving a train-state file at/after the fault step writes a
    TRUNCATED file at the final path and exits 87 — the legacy
    non-atomic failure, reproduced on demand; a second life with the
    marker present saves normally (atomic) and can fall back past the
    truncated file."""
    import subprocess, sys, textwrap

    script = tmp_path / "drill.py"
    script.write_text(textwrap.dedent("""
        import numpy as np, sys
        from eadgan_tpu.train import checkpoint as ckpt
        d = sys.argv[1]
        ckpt.save_pytree(d + "/train_state_1.ckpt", {"w": np.arange(32, dtype=np.float32)})
        ckpt.save_pytree(d + "/train_state_2.ckpt", {"w": np.arange(32, dtype=np.float32) + 1})
        print("unreachable", flush=True)
    """))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PYTHONPATH=os.pathsep.join(
            filter(None, [repo, os.environ.get("PYTHONPATH", "")])
        ),
        EADGAN_FAULT_KILL_SAVE_STEP="2",
        EADGAN_FAULT_KILL_SAVE_MARKER=str(tmp_path / "fault.marker"),
    )
    import subprocess
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 87
    assert "unreachable" not in proc.stdout
    assert (tmp_path / "fault.marker").exists()

    # life 2: the fallback restore survives the truncated newest file
    from eadgan_tpu.train import checkpoint as ckpt

    template = {"w": np.zeros(32, dtype=np.float32)}
    restored, step = ckpt.restore_latest(str(tmp_path), "train_state", template)
    assert step == 1
    np.testing.assert_array_equal(restored["w"], np.arange(32, dtype=np.float32))


def test_supervise_resume_flag_does_not_accumulate():
    """with_resume_auto strips any existing --resume pair before
    appending, so restart N's command line carries exactly one."""
    from eadgan_tpu.cli.supervise import with_resume_auto

    args = ["--max_steps", "100", "--resume", "old.ckpt", "--chain", "32"]
    once = with_resume_auto(args)
    assert once == ["--max_steps", "100", "--chain", "32", "--resume", "auto"]
    assert with_resume_auto(once) == once  # idempotent across restarts
    assert with_resume_auto(["--resume=x.ckpt"]) == ["--resume", "auto"]
