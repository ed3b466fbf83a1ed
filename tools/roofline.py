#!/usr/bin/env python
"""Roofline analysis for the train-step pipelines, with every input
measured on the attached chip instead of taken from datasheets.

For each requested pipeline this reports:

* FLOPs and the bytes-accessed UPPER BOUND from the TPU-compiled HLO
  (``compiled.cost_analysis()`` — fusion-operand accounting undercredits
  VMEM reuse, so small steps can measure *faster* than their naive
  byte floor; treat the bound as a ceiling on traffic, not a floor on
  time);
* the chip's measured streaming HBM bandwidth (1 GiB saxpy chained in a
  fori_loop — ~697 GB/s on the v5e here, 85% of the 819 nominal);
* the chip's measured peak matmul rate (8k-square bf16 dot — ~190 TF/s
  here vs the 197 paper peak);
* the measured step time (same fori_loop length-differencing harness as
  bench.py), and where it sits against both measured ceilings.

This is the tool behind ROUND_NOTES' "the CelebA step is
bandwidth-bound" analysis.  Usage:

    python tools/roofline.py [--batch 128] [--pipelines celeba,dsprites,mnist]

Writes ROOFLINE.json next to the repo root's other artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("EADGAN_WARP_PRECISION", "fast")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # repo-root bench harness: _timed_loop, _compute_dtype  # noqa: E402


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def measure_hbm_gbps():
    """Streaming read+write bandwidth via a carried 1 GiB saxpy."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024  # 1 GiB f32
    x = jnp.ones((n,), jnp.float32)

    dt = bench._timed_loop(lambda v: v * 0.999999 + 1e-7, x, steps=10)
    return 2 * n * 4 / dt / 1e9


def measure_matmul_tflops():
    """Peak-ish MXU rate from a carried bf16 4096-square matmul chain."""
    import jax
    import jax.numpy as jnp

    k = 4096
    a = jnp.ones((k, k), jnp.bfloat16)

    def body(c):
        # carry-dependent so the chain cannot be hoisted or narrowed
        return (jnp.tanh(c @ a),)

    dt = bench._timed_loop(lambda c: body(c[0]), (a,), steps=50)
    return 2 * k**3 / dt / 1e12


def _pipeline_step(name, batch):
    """(step_like, init_carry, lowered) for a pipeline, reusing the
    bench harness model builders' exact configuration."""
    import jax
    import jax.numpy as jnp

    if name == "celeba":
        from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
        from eadgan_tpu.train.config import CelebaConfig
        from eadgan_tpu.train.gan_celeba import (
            init_celeba_gan_state,
            make_celeba_gan_step,
        )

        dtype = bench._compute_dtype(jnp)
        config = CelebaConfig(batch_size=batch)
        g, d = CelebaGenerator(dtype=dtype), CelebaDiscriminator(dtype=dtype)
        state = init_celeba_gan_state(g, d, config, jax.random.PRNGKey(0))
        step = make_celeba_gan_step(g, d, config)
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1), (batch, 64, 64, 3), minval=-1.0, maxval=1.0
        )
        return (lambda c: (step(c[0], c[1])[0], c[1])), (state, imgs), step.lower(state, imgs)

    if name == "dsprites":
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

        dtype = bench._compute_dtype(jnp)
        config = SpritesGanConfig(batch_size=batch)
        g, d, e, pxy = (
            SpritesGenerator(dtype=dtype),
            SpritesDiscriminator(dtype=dtype),
            SpritesEncoder(dtype=dtype),
            SpritesEncoderPxy(),
        )
        pxy_vars = pxy.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
        state = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
        step = make_sprites_gan_step(g, d, e, pxy, config)
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (batch, 64, 64, 1))
        return (lambda c: (step(c[0], c[1])[0], c[1])), (state, imgs), step.lower(state, imgs)

    if name == "mnist":
        from eadgan_tpu.models import (
            AffineApproximator,
            MnistDiscriminator,
            MnistEncoder,
            MnistGenerator,
        )
        from eadgan_tpu.train.config import MnistConfig
        from eadgan_tpu.train.gan_mnist import init_mnist_gan_state, make_mnist_gan_step

        dtype = bench._compute_dtype(jnp)
        config = MnistConfig(batch_size=batch)
        g, d, e = (
            MnistGenerator(dtype=dtype),
            MnistDiscriminator(dtype=dtype),
            MnistEncoder(dtype=dtype),
        )
        approx = AffineApproximator()
        approx_vars = approx.init(jax.random.PRNGKey(1), jnp.zeros((1, 6)))
        state = init_mnist_gan_state(g, d, e, approx_vars, config, jax.random.PRNGKey(0))
        step = make_mnist_gan_step(g, d, e, approx, config)
        imgs = jax.random.uniform(
            jax.random.PRNGKey(2), (batch, 32, 32, 1), minval=-1.0, maxval=1.0
        )
        labels = jnp.zeros((batch,), jnp.int32)
        return (
            (lambda c: (step(c[0], c[1], c[2])[0], c[1], c[2])),
            (state, imgs, labels),
            step.lower(state, imgs, labels),
        )

    raise SystemExit(f"unknown pipeline {name!r}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--pipelines", default="celeba,dsprites,mnist")
    parser.add_argument("--skip_calibration", action="store_true",
                        help="reuse calibration numbers from an existing ROOFLINE.json")
    opt = parser.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    out_path = os.path.join(REPO, "ROOFLINE.json")
    result = {"batch": opt.batch, "device": str(jax.devices()[0])}
    if opt.skip_calibration and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        result["hbm_gbps"] = prior["hbm_gbps"]
        result["matmul_tflops"] = prior["matmul_tflops"]
    else:
        result["hbm_gbps"] = round(measure_hbm_gbps(), 1)
        result["matmul_tflops"] = round(measure_matmul_tflops(), 1)
    print(f"measured ceilings: {result['hbm_gbps']} GB/s HBM, "
          f"{result['matmul_tflops']} TF/s matmul", flush=True)

    rows = {}
    for name in opt.pipelines.split(","):
        step_like, carry, lowered = _pipeline_step(name.strip(), opt.batch)
        flops, max_bytes = _cost(lowered.compile())
        dt = bench._timed_loop(step_like, carry)
        compute_floor_ms = flops / (result["matmul_tflops"] * 1e12) * 1e3
        bw_ceiling_ms = max_bytes / (result["hbm_gbps"] * 1e9) * 1e3
        row = {
            "ms": round(dt * 1e3, 3),
            "images_per_sec": round(opt.batch / dt, 1),
            "gflop": round(flops / 1e9, 1),
            "max_bytes_gb": round(max_bytes / 1e9, 2),
            "tflops_achieved": round(flops / dt / 1e12, 1),
            "compute_floor_ms": round(compute_floor_ms, 3),
            "bytes_bound_ms_upper": round(bw_ceiling_ms, 3),
            "pct_of_measured_matmul_rate": round(100 * (compute_floor_ms / 1e3) / dt, 1),
        }
        rows[name.strip()] = row
        print(json.dumps({"pipeline": name.strip(), **row}), flush=True)

    result["pipelines"] = rows
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
