#!/usr/bin/env python
"""Mesh scale-out validation beyond the 8-device test mesh (VERDICT r4
item 4).

    python tools/mesh_scale_check.py [--devices 8,16,32] \
        [--out MULTICHIP_SCALE.json]

Three checks per device count, all on virtual CPU devices
(``--xla_force_host_platform_device_count=N`` — the same mechanism the
driver's ``dryrun_multichip`` uses, so a v5e slice topology can be
validated without N real chips):

1. **dryrun**: the full six-topology ``__graft_entry__.dryrun_multichip``
   (dSprites DP, MNIST DP, chained DP window, chained ZeRO window,
   CelebA 2D data x model mesh, CelebA 2D + ZeRO) compiles and executes
   at N devices — per-device batch shrinks to 2 (DP rows) and 1 (CelebA
   rows at batch=N on the 2D mesh), which is where BN stats, ZeRO
   moment divisibility (``zero_spec`` falls back to replication for
   leaves with no N-divisible dimension), and window metric packing all
   change shape.
2. **invariance**: one FIXED global batch (32, seeded) through the
   dSprites GAN step at every N — metrics must agree across device
   counts within the same bar tests/test_parallel.py holds DP to
   against single-device (rtol 2e-4: psum reduction order is the only
   difference).  This is the BN-semantics check: per-device BN stats
   would diverge across N, global-batch stats agree.
3. **resume across device counts**: a train-state checkpoint written at
   N=8 (after 3 steps) restores at each larger N and the 2-step
   continuation reproduces the N=8 continuation's metrics — the
   checkpoint contract is device-count-free (parallel/multihost.py
   is_coordinator docstring).

Writes one JSON report; CLAUDE.md documents the supported range.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n):
    return dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
        N_DEVICES=str(n),
        PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
    )


# ---------------------------------------------------------------- probe
# Subprocess worker: fixed-global-batch dSprites GAN steps at N devices.


def probe(opt) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from eadgan_tpu.models import (
        SpritesDiscriminator,
        SpritesEncoder,
        SpritesEncoderPxy,
        SpritesGenerator,
    )
    from eadgan_tpu.parallel import default_mesh, replicate, shard_batch
    from eadgan_tpu.train.checkpoint import restore_pytree, save_pytree
    from eadgan_tpu.train.config import SpritesGanConfig
    from eadgan_tpu.train.gan_dsprites import (
        init_sprites_gan_state,
        make_sprites_gan_step,
    )

    assert len(jax.devices()) == opt.n, (len(jax.devices()), opt.n)
    config = SpritesGanConfig()
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
    if opt.restore:
        state = restore_pytree(opt.restore, jax.device_get(state))
    step = make_sprites_gan_step(g, d, e, pxy, config)

    mesh = default_mesh(jax.devices()[: opt.n])
    state = replicate(mesh, state)

    start = int(jax.device_get(state.step)) if hasattr(state, "step") else 0
    out = []
    for i in range(opt.steps):
        # data schedule is a pure function of the ABSOLUTE step index,
        # so a restored continuation sees the same batches at any N
        rng = np.random.default_rng(1000 + start + i)
        img = shard_batch(
            mesh,
            rng.uniform(0, 1, (opt.global_batch, 64, 64, 1)).astype(np.float32),
        )
        state, metrics = step(state, img)
        out.append({k: float(v) for k, v in sorted(metrics.items())})
    if opt.save:
        save_pytree(opt.save, jax.device_get(state))
    print("PROBE_JSON:" + json.dumps(out), flush=True)


# -------------------------------------------------------------- launcher


def _run(cmd, env, timeout):
    t0 = time.time()
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=timeout
    )
    return proc, round(time.time() - t0, 1)


def _probe_rows(opt, n, steps, save="", restore=""):
    cmd = [
        sys.executable, os.path.abspath(__file__), "--probe", "--n", str(n),
        "--global_batch", str(opt.global_batch), "--steps", str(steps),
    ]
    if save:
        cmd += ["--save", save]
    if restore:
        cmd += ["--restore", restore]
    proc, wall = _run(cmd, _env(n), opt.timeout)
    if proc.returncode != 0:
        return None, wall, proc.stdout[-2000:] + proc.stderr[-2000:]
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_JSON:"):
            return json.loads(line[len("PROBE_JSON:"):]), wall, ""
    return None, wall, "no PROBE_JSON line"


def _compare(a, b):
    """Max relative difference between two metric-row lists."""
    worst = 0.0
    for ra, rb in zip(a, b):
        for k in ra:
            denom = max(abs(ra[k]), abs(rb[k]), 1e-8)
            worst = max(worst, abs(ra[k] - rb[k]) / denom)
    return worst


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--probe", action="store_true", help="internal worker")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--global_batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--save", default="")
    p.add_argument("--restore", default="")
    p.add_argument("--devices", default="8,16,32")
    p.add_argument(
        "--dryrun_log", action="append", default=[],
        help="N=path: ingest an existing `__graft_entry__.py` run log "
        "for N devices instead of re-running it (the 32-device CelebA "
        "2D+ZeRO topology alone compiles ~25 min on a 1-core host)",
    )
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--out", default="MULTICHIP_SCALE.json")
    p.add_argument("--workdir", default="/tmp/eadgan_mesh_scale")
    opt = p.parse_args()

    if opt.probe:
        probe(opt)
        return 0

    os.makedirs(opt.workdir, exist_ok=True)
    counts = [int(s) for s in opt.devices.split(",")]
    report = {"devices": counts, "dryruns": {}, "invariance": {}, "resume": {}}
    ok = True

    # 1. six-topology dryrun at each count
    ingested = {}
    for spec in opt.dryrun_log:
        n_str, _, path = spec.partition("=")
        ingested[int(n_str)] = path
    for n in counts:
        if n in ingested:
            text = open(ingested[n]).read()
            good = text.count(" ok:") >= 6
            report["dryruns"][n] = {
                "ok": good,
                "ingested_from": ingested[n],
                "note": "direct `__graft_entry__.py` run (same command/env "
                "this launcher uses), log ingested via --dryrun_log",
                "tail": text[-1200:],
            }
        else:
            proc, wall = _run(
                [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
                _env(n), opt.timeout,
            )
            good = proc.returncode == 0 and proc.stdout.count(" ok:") >= 6
            report["dryruns"][n] = {
                "rc": proc.returncode,
                "ok": good,
                "wall_s": wall,
                "tail": proc.stdout[-1200:] if good else
                (proc.stdout + proc.stderr)[-4000:],
            }
        ok &= good
        print(f"[scale] dryrun n={n}: {'ok' if good else 'FAIL'}", flush=True)

    # 2. fixed-global-batch invariance across counts
    rows = {}
    for n in counts:
        r, wall, err = _probe_rows(opt, n, opt.steps)
        rows[n] = r
        report["invariance"][n] = {"wall_s": wall, "rows": r, "err": err}
        print(f"[scale] invariance probe n={n}: "
              f"{'ok' if r else 'FAIL ' + err[:200]} ({wall}s)", flush=True)
    base = counts[0]
    for n in counts[1:]:
        if rows[base] and rows[n]:
            diff = _compare(rows[base], rows[n])
            good = diff <= 2e-4  # test_parallel.py's DP-vs-single bar
            report["invariance"][f"max_rel_diff_{base}_vs_{n}"] = diff
            ok &= good
            print(f"[scale] invariance {base} vs {n}: max rel diff {diff:.2e} "
                  f"{'ok' if good else 'FAIL'}", flush=True)
        else:
            ok = False

    # 3. checkpoint resume across device counts
    ckpt = os.path.join(opt.workdir, "scale_state.ckpt")
    if os.path.exists(ckpt):
        os.unlink(ckpt)
    pre, wall, err = _probe_rows(opt, base, 3, save=ckpt)
    report["resume"]["written_at"] = {"n": base, "wall_s": wall, "err": err}
    conts = {}
    for n in counts:
        r, wall, err = _probe_rows(opt, n, 2, restore=ckpt)
        conts[n] = r
        report["resume"][n] = {"wall_s": wall, "rows": r, "err": err}
        print(f"[scale] resume continuation n={n}: "
              f"{'ok' if r else 'FAIL ' + err[:200]} ({wall}s)", flush=True)
    for n in counts[1:]:
        if conts[base] and conts[n]:
            diff = _compare(conts[base], conts[n])
            good = diff <= 2e-4
            report["resume"][f"max_rel_diff_{base}_vs_{n}"] = diff
            ok &= good
            print(f"[scale] resume {base} vs {n}: max rel diff {diff:.2e} "
                  f"{'ok' if good else 'FAIL'}", flush=True)
        else:
            ok = False

    report["what"] = (
        "mesh scale-out validation: the six dryrun topologies, a fixed-"
        "global-batch numeric-invariance probe, and cross-device-count "
        "checkpoint resume, at "
        + ", ".join(str(c) for c in counts)
        + " virtual CPU devices (per-device batch down to "
        f"{opt.global_batch // max(counts)})"
    )
    report["all_pass"] = bool(ok)
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {opt.out}; all_pass={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
