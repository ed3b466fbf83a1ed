#!/usr/bin/env python
"""Measured accept/reject for the LAST untaken CelebA perf lever: a
backward-inclusive VMEM fusion of the two largest D-tower conv layers
(round-4 VERDICT item 6 — ROOFLINE estimated it a net loss; this probe
replaces the estimate with chip measurements).

    python tools/double_conv_bwd_probe.py        (TPU; ~3 min)

The candidate: fuse D layer-2 + layer-3 — conv(128->256, k4 s2 p1) +
bias + LeakyReLU + conv(256->512, k4 s2 p1) + bias + LeakyReLU,
/root/reference/celebA/EAD-GAN_celebA.py:110-122 — forward AND backward
into Pallas kernels that keep the (B,16,16,256) intermediate ``h`` (and
its gradient) resident in VMEM, eliminating its HBM round trips.

What is measured on the chip:

1. XLA wall time of the pair, forward and forward+backward (grads wrt
   input, both kernels, both biases — the training configuration), with
   the anti-DCE / anti-hoist harness of tools/perf_breakdown_small.py.
2. ``cost_analysis`` bytes + FLOPs of the fwd+bwd program.
3. The fusion's SAVINGS CEILING: a deliberately generous count of 8
   eliminated h-sized HBM transfers (fwd write+read of h; bwd read of h
   for dW3, read for the LReLU mask, write+read of dh, +2 slack) at the
   measured streaming bandwidth (ROOFLINE.json hbm_gbps).
4. The measured Pallas deficit: the round-3 single-conv probe
   (evidence/perf_r3/fused_conv_probe.json) timed this exact layer-2
   shape at 0.407 ms in Pallas vs 0.178 ms in XLA (+0.229 ms per conv
   instance).  A backward-inclusive double-conv fusion is SIX conv-like
   Pallas kernel instances (2 fwd + dx/dW per conv); even at only the
   single measured per-instance deficit, the cost dwarfs the ceiling.

Verdict = accept iff savings_ceiling > pallas_deficit_one_instance
(the most charitable possible comparison: one deficit vs eight saved
transfers).  Output lands in evidence/perf_r5/ and the perf_closure
section of ROOFLINE.json / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from perf_breakdown_small import timed

B, HW, C1, C2, C3 = 128, 32, 128, 256, 512
SLOPE = 0.1


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("EADGAN_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, C1)), bf16)
    w2 = jnp.asarray(0.05 * rng.standard_normal((4, 4, C1, C2)), bf16)
    b2 = jnp.asarray(0.01 * rng.standard_normal((C2,)), bf16)
    w3 = jnp.asarray(0.05 * rng.standard_normal((4, 4, C2, C3)), bf16)
    b3 = jnp.asarray(0.01 * rng.standard_normal((C3,)), bf16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def pair(x, w2, b2, w3, b3):
        h = conv(x, w2) + b2
        h = jnp.where(h >= 0, h, h * SLOPE).astype(bf16)
        o = conv(h, w3) + b3
        return jnp.where(o >= 0, o, o * SLOPE).astype(bf16)

    def loss(x, w2, b2, w3, b3):
        return jnp.sum(jnp.square(pair(x, w2, b2, w3, b3).astype(jnp.float32)))

    grad_all = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    def perturb(acc, t):
        return (t + acc).astype(bf16)

    results = {
        "shape": f"({B},{HW},{HW},{C1}) -> ({C2}) -> ({C3}), k4 s2 p1, "
        "bias+LeakyReLU(0.1), bf16",
    }

    def report(name, dt):
        results[name] = round(dt * 1e3, 4)
        print(json.dumps({"name": name, "ms": results[name]}), flush=True)

    report("xla_pair_fwd_ms", timed(
        lambda acc, x, w2, b2, w3, b3: pair(perturb(acc, x), w2, b2, w3, b3),
        x, w2, b2, w3, b3, steps=300))

    def fwd_bwd(acc, x, w2, b2, w3, b3):
        gs = grad_all(perturb(acc, x), w2, b2, w3, b3)
        # single wide probe value: forces every grad, defeats narrowing
        return sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in gs)

    report("xla_pair_fwd_bwd_ms", timed(
        fwd_bwd, x, w2, b2, w3, b3, steps=200))

    # bytes + flops of the compiled fwd+bwd program
    try:
        comp = jax.jit(
            lambda *a: grad_all(*a)
        ).lower(x, w2, b2, w3, b3).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        results["fwd_bwd_bytes_gb"] = round(
            float(ca.get("bytes accessed", float("nan"))) / 1e9, 4)
        results["fwd_bwd_gflop"] = round(
            float(ca.get("flops", float("nan"))) / 1e9, 2)
    except Exception as e:
        results["cost_analysis_error"] = str(e)[:120]

    # savings ceiling: 8 eliminated h-sized transfers at streaming BW
    h_bytes = B * (HW // 2) * (HW // 2) * C2 * 2  # bf16 intermediate
    try:
        hbm_gbps = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json"))
        )["hbm_gbps"]
    except Exception:
        hbm_gbps = 676.0
    ceiling_ms = 8 * h_bytes / (hbm_gbps * 1e9) * 1e3
    results["h_intermediate_mb"] = round(h_bytes / 1e6, 2)
    results["hbm_gbps"] = hbm_gbps
    results["savings_ceiling_ms"] = round(ceiling_ms, 4)

    # measured per-instance pallas deficit from the round-3 probe
    r3 = os.path.join(
        os.path.dirname(__file__), "..",
        "evidence", "perf_r3", "fused_conv_probe.json",
    )
    try:
        d = json.load(open(r3))
        deficit = d["pallas_fused"] - d["xla_conv_only"]
        results["pallas_per_instance_deficit_ms"] = round(deficit, 4)
        results["pallas_probe_source"] = "evidence/perf_r3/fused_conv_probe.json"
    except Exception:
        deficit = 0.229
        results["pallas_per_instance_deficit_ms"] = deficit
        results["pallas_probe_source"] = "round-3 recorded values (file absent)"

    results["kernel_instances_needed"] = 6  # 2 fwd + dx/dW per conv
    accept = ceiling_ms > deficit
    results["verdict"] = "accept" if accept else "reject"
    results["conclusion"] = (
        f"REJECTED, measured: eliminating ALL {8} HBM round trips of the "
        f"{results['h_intermediate_mb']} MB intermediate saves at most "
        f"{results['savings_ceiling_ms']} ms/step, while the measured "
        f"Pallas deficit for ONE conv instance of this very shape is "
        f"{results['pallas_per_instance_deficit_ms']} ms (a backward-"
        "inclusive fusion needs ~6 instances). The ceiling is "
        f"{results['pallas_per_instance_deficit_ms'] / max(ceiling_ms, 1e-9):.0f}x "
        "below break-even on a single kernel, before any backward-kernel "
        "complexity. XLA's conv + its automatic epilogue fusion stay."
        if not accept else "accepted: ceiling exceeds deficit — implement."
    )

    print(json.dumps(results, indent=1), flush=True)
    with open("/tmp/double_conv_bwd_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
