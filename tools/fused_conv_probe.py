"""Bounded probe: can a VMEM-fused Pallas conv(+bias+LeakyReLU) beat
XLA's conv for the CelebA D-tower shapes?  (SURVEY.md §2.2 N1's optional
"fused Pallas conv+bias+LeakyReLU block kernel"; round-2 VERDICT item 7.)

The roofline identified inter-layer activation round-trips as the only
remaining CelebA lever (~10-30%% of step bytes).  This tool measures, on
the real chip, for the D layer-2 shape (B, 32, 32, 128) -> (B, 16, 16,
256), k4 s2 p1, LeakyReLU 0.1, bf16:

  1. XLA conv alone vs conv+bias+lrelu — the *elementwise fusion delta*.
     If ~0, XLA already fuses the epilogue and a one-pair Pallas kernel
     has no bandwidth headroom by construction.
  2. A Pallas fused conv+bias+lrelu kernel (phase-plane tap
     decomposition, below) — wall time + bit-level parity vs XLA.
  3. cost_analysis bytes for both.

Kernel formulation (no strided access, no in-kernel reshapes — the
Mosaic constraints learned in ops/stn_pallas.py):

  A k4 s2 p1 conv reads, for output (i, j), input rows/cols 2i-1..2i+2.
  Splitting the input into 4 *phase planes* x[py::2, px::2] (each
  Ho x Wo), every one of the 16 kernel taps becomes a CONTIGUOUS shifted
  slice of one plane with offsets in {-1, 0, +1}.  Planes are padded
  with a 1-texel zero halo OUTSIDE the kernel (XLA pad, cheap) and
  flattened to (P*P, Cin) rows, P = Ho+2; a tap is then a pure sublane
  shift by oi*P+oj, and the conv is 16 accumulated MXU matmuls

      acc[(P*P), Cout] += shift(plane[phase], oi*P+oj) @ w[di,dj]

  Bias + LeakyReLU fuse into the epilogue; halo rows accumulate garbage
  and are masked to zero before the store (the interior is sliced back
  outside).  FLOP overhead vs the ideal conv: (P*P)/(Ho*Wo) = 324/256 =
  1.27x — the price of the halo rows riding along in every dot.

Verdict from the measurements lands in ROUND_NOTES.md / ROOFLINE.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from perf_breakdown_small import timed  # fori_loop differencing harness


# --------------------------------------------------------------- pallas

# tap offset tables: original coord 2i-1+d  ->  phase parity p, plane
# shift o (relative to the padded interior position i+1)
_PHASE = {0: 1, 1: 0, 2: 1, 3: 0}
_SHIFT = {0: -1, 1: 0, 2: 0, 3: 1}


def _fused_kernel(planes_ref, w_ref, b_ref, out_ref, *, p: int, cin: int,
                  cout: int, slope: float):
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32
    pp = p * p
    acc = jnp.zeros((pp, cout), f32)
    # zero block tall enough for the largest |shift| = P+1
    z = jnp.zeros((p + 1, cin), planes_ref.dtype)
    for di in range(4):
        for dj in range(4):
            phase = _PHASE[di] * 2 + _PHASE[dj]
            s = _SHIFT[di] * p + _SHIFT[dj]
            plane = planes_ref[0, phase]  # (P*P, Cin)
            shifted = jnp.concatenate([z, plane, z], axis=0)[
                p + 1 + s : p + 1 + s + pp
            ]
            acc = acc + jnp.dot(
                shifted, w_ref[di * 4 + dj], preferred_element_type=f32
            )
    # interior mask: padded row q -> (r, c); halo rows accumulated
    # neighbours' garbage via the flattened-shift column wrap — zero them.
    q = jax.lax.broadcasted_iota(jnp.int32, (pp, cout), 0)
    r = q // p
    c = q - r * p
    interior = (
        (r >= 1) & (r <= p - 2) & (c >= 1) & (c <= p - 2)
    )
    out = acc + b_ref[0].astype(f32)
    out = jnp.where(out >= 0, out, out * slope)
    out = jnp.where(interior, out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_conv_lrelu_pallas(x, w, b, slope=0.1):
    """(B, H, W, Cin) -> (B, H/2, W/2, Cout); torch Conv(k4, s2, p1)
    + bias + LeakyReLU(slope), phase-plane Pallas kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, _, cin = x.shape
    ho = h // 2
    p = ho + 2
    cout = w.shape[-1]
    # phase planes with a 1-texel zero halo, flattened: (B, 4, P*P, Cin)
    xp = x.reshape(bsz, ho, 2, ho, 2, cin).transpose(0, 2, 4, 1, 3, 5)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    planes = xp.reshape(bsz, 4, p * p, cin)
    wt = w.reshape(16, cin, cout)

    kernel = functools.partial(
        _fused_kernel, p=p, cin=cin, cout=cout, slope=slope
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, 4, p * p, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p * p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, p * p, cout), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(planes, wt, b.reshape(1, cout))
    return out.reshape(bsz, p, p, cout)[:, 1 : ho + 1, 1 : ho + 1, :]


# ------------------------------------------------------------------ xla


def xla_conv(x, w):
    import jax.numpy as jnp
    from jax import lax

    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def xla_conv_lrelu(x, w, b, slope=0.1):
    import jax.numpy as jnp

    out = xla_conv(x, w) + b.astype(jnp.float32)
    out = jnp.where(out >= 0, out, out * slope)
    return out.astype(x.dtype)


# ---------------------------------------------------------------- probe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=32, help="input spatial size")
    ap.add_argument("--cin", type=int, default=128)
    ap.add_argument("--cout", type=int, default=256)
    ap.add_argument("--steps", type=int, default=300)
    opt = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("EADGAN_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((opt.batch, opt.hw, opt.hw, opt.cin)), bf16)
    w = jnp.asarray(0.05 * rng.standard_normal((4, 4, opt.cin, opt.cout)), bf16)
    b = jnp.asarray(0.01 * rng.standard_normal((opt.cout,)), bf16)

    results = {"shape": [opt.batch, opt.hw, opt.hw, opt.cin, opt.cout]}

    def report(name, dt):
        results[name] = round(dt * 1e3, 4)
        print(json.dumps({"name": name, "ms": results[name]}), flush=True)

    # correctness first (small tolerance: bf16 taps, f32 accumulation in
    # both implementations)
    got = np.asarray(fused_conv_lrelu_pallas(x, w, b), np.float32)
    ref = np.asarray(xla_conv_lrelu(x, w, b), np.float32)
    err = np.max(np.abs(got - ref))
    denom = max(1.0, float(np.max(np.abs(ref))))
    results["max_abs_err"] = float(err)
    print(json.dumps({"max_abs_err": float(err), "rel": float(err) / denom}),
          flush=True)
    assert err / denom < 2e-2, "pallas fused conv does not match XLA"

    # timed() feeds an anti-hoist accumulator as the first argument —
    # perturb x with it so the loop body is not loop-invariant.
    def perturb(acc, x):
        return (x + acc).astype(bf16)

    report("xla_conv_only", timed(
        lambda acc, x, w: xla_conv(perturb(acc, x), w).astype(bf16),
        x, w, steps=opt.steps))
    report("xla_conv_bias_lrelu", timed(
        lambda acc, x, w, b: xla_conv_lrelu(perturb(acc, x), w, b),
        x, w, b, steps=opt.steps))
    report("pallas_fused", timed(
        lambda acc, x, w, b: fused_conv_lrelu_pallas(perturb(acc, x), w, b),
        x, w, b, steps=opt.steps))

    results["elementwise_fusion_delta_ms"] = round(
        results["xla_conv_bias_lrelu"] - results["xla_conv_only"], 4
    )

    # bytes: cost_analysis of the two jitted programs (upper bounds)
    for name, fn, args in (
        ("xla", xla_conv_lrelu, (x, w, b)),
        ("pallas", fused_conv_lrelu_pallas, (x, w, b)),
    ):
        try:
            comp = jax.jit(fn).lower(*args).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            results[f"{name}_bytes_gb"] = round(
                float(ca.get("bytes accessed", float("nan"))) / 1e9, 4
            )
            results[f"{name}_gflop"] = round(
                float(ca.get("flops", float("nan"))) / 1e9, 2
            )
        except Exception as e:  # axon tunnel may not expose cost_analysis
            results[f"{name}_cost_analysis_error"] = str(e)[:120]

    print(json.dumps(results), flush=True)
    with open("/tmp/fused_conv_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
