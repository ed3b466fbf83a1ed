#!/usr/bin/env python
"""Throughput envelope beyond reference batch shapes (VERDICT r3 item 4).

Benches every pipeline at batch {64, 128, 256, 512, 1024} on the real
chip — pure perf measurement, no training-quality claims — and records
the throughput-optimal operating point per pipeline.  The question this
answers: are the batch-128 roofline plateaus (CelebA 65.5% of the
measured matmul rate, dSprites 16.8%, MNIST 47.9% — ROOFLINE.json)
batch-limited, or true bandwidth/structure saturation?

Method: identical harness to bench.py (`_timed_loop` fori_loop length
differencing, bf16 compute, median of 5), model/step builders shared
with tools/roofline.py.  Achieved TF/s uses the batch-128 compiled FLOP
counts from ROOFLINE.json scaled linearly in batch — every op in these
steps is batch-linear (convs, matmuls, elementwise; no attention), so
the scaling is exact; the generator-inference FLOPs are cost-analyzed
here once (ROOFLINE.json has no inference row).  A batch that fails to
compile or run (HBM exhaustion) is recorded infeasible rather than
aborting the sweep.

Output: one row per (pipeline, batch) merged into ROOFLINE.json under
"envelope", plus per-pipeline optimal-point summaries.

Reference batch flags this generalizes:
/root/reference/celebA/EAD-GAN_celebA.py:42, dSprites/rp.py:41.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402
from roofline import _pipeline_step  # noqa: E402

BATCHES = (64, 128, 256, 512, 1024)


def _generate_step(batch):
    """(step_like, carry, lowered) for pure CelebA generator inference —
    the accumulator-probe pattern from bench.bench_generate (a naive
    probe lets XLA DCE the forward; see the retracted round-2 reading)."""
    import jax
    import jax.numpy as jnp

    from eadgan_tpu.models import CelebaGenerator
    from eadgan_tpu.train.config import CelebaConfig

    config = CelebaConfig()
    gen = CelebaGenerator(dtype=jnp.bfloat16)
    variables = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.latent_dim)),
        jnp.zeros((1, config.n_classes)),
        jnp.zeros((1, config.code_dim)),
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, config.latent_dim))
    lab = jax.nn.one_hot(jnp.zeros((batch,), jnp.int32), config.n_classes)
    code = jnp.zeros((batch, config.code_dim))

    def fwd(c):
        z, lab, code, acc = c
        out = gen.apply(variables, z + acc * 1e-20, lab, code, train=False)
        probe = jnp.sum(jnp.square(out.astype(jnp.float32)))
        return (z, lab, code, acc + probe * 1e-20)

    import functools

    lowered = jax.jit(
        functools.partial(gen.apply, train=False)
    ).lower(variables, z, lab, code)
    return fwd, (z, lab, code, jnp.float32(0)), lowered


def _flops_per_image(roofline: dict) -> dict:
    """Batch-128 compiled FLOPs per image, per pipeline (train steps from
    ROOFLINE.json; generator inference cost-analyzed here)."""
    out = {}
    for name in ("celeba", "dsprites", "mnist"):
        out[name] = roofline["pipelines"][name]["gflop"] * 1e9 / roofline["batch"]
    _, _, lowered = _generate_step(128)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    out["generate"] = ca.get("flops", 0.0) / 128
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--pipelines", default="celeba,dsprites,mnist,generate",
        help="comma-separated subset to sweep",
    )
    parser.add_argument(
        "--batches", default=",".join(map(str, BATCHES)),
    )
    parser.add_argument("--out", default=os.path.join(REPO, "ROOFLINE.json"))
    opt = parser.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    with open(os.path.join(REPO, "ROOFLINE.json")) as f:
        roofline = json.load(f)
    matmul_tflops = roofline["matmul_tflops"]
    flops_img = _flops_per_image(roofline)

    envelope = {}
    for name in opt.pipelines.split(","):
        rows = []
        for batch in (int(b) for b in opt.batches.split(",")):
            print(f"[{name}] batch {batch} ...", flush=True)
            try:
                if name == "generate":
                    step_like, carry, _ = _generate_step(batch)
                else:
                    step_like, carry, _ = _pipeline_step(name, batch)
                dt = bench._timed_loop(step_like, carry)
            except Exception as exc:  # noqa: BLE001 — HBM exhaustion etc.
                rows.append(
                    {"batch": batch, "feasible": False,
                     "error": f"{type(exc).__name__}: {str(exc)[:300]}"}
                )
                print(f"  infeasible: {type(exc).__name__}", flush=True)
                continue
            ips = batch / dt
            tf = flops_img[name] * ips / 1e12
            rows.append(
                {
                    "batch": batch,
                    "feasible": True,
                    "step_ms": round(dt * 1e3, 3),
                    "images_per_sec": round(ips, 1),
                    "tflops_achieved": round(tf, 1),
                    "pct_of_measured_matmul_rate": round(
                        100 * tf / matmul_tflops, 1
                    ),
                }
            )
            print(f"  {rows[-1]}", flush=True)
        feasible = [r for r in rows if r.get("feasible")]
        best = max(feasible, key=lambda r: r["images_per_sec"]) if feasible else None
        at128 = next((r for r in feasible if r["batch"] == 128), None)
        summary = {"rows": rows}
        if best and at128:
            summary["optimal_batch"] = best["batch"]
            summary["optimal_images_per_sec"] = best["images_per_sec"]
            summary["gain_vs_batch128_pct"] = round(
                100 * (best["images_per_sec"] / at128["images_per_sec"] - 1), 1
            )
        envelope[name] = summary

    roofline["envelope"] = envelope
    with open(opt.out, "w") as f:
        json.dump(roofline, f, indent=2)
    print(f"wrote {opt.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
