#!/usr/bin/env python
"""Measure CelebA generator inference: exact bf16 model.apply vs the
BN-folded bf16 path vs the int8-quantized path (ops/quant.py), all at
the bench batch on the real chip.

Shares bench.py's _timed_loop (fori_loop differencing, accumulator
feedback — see the measurement-hazard notes there).  Also reports the
int8-vs-f32 output PSNR on the same latents so the speed number always
travels with its fidelity number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quant_bench.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BATCH, _timed_loop  # noqa: E402
from eadgan_tpu.models import CelebaGenerator  # noqa: E402
from eadgan_tpu.ops.quant import make_celeba_infer  # noqa: E402
from eadgan_tpu.train.config import CelebaConfig  # noqa: E402


def main():
    config = CelebaConfig()
    gen = CelebaGenerator(dtype=jnp.bfloat16)
    variables = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.latent_dim)),
        jnp.zeros((1, config.n_classes)),
        jnp.zeros((1, config.code_dim)),
    )
    # Non-identity BN stats so the folded paths do real work (fresh init
    # stats are mean 0 / var 1, which would under-count the fold's cost).
    variables = jax.device_get(variables)
    rng = np.random.RandomState(7)

    def perturb(path, x):
        name = "/".join(str(k) for k in path)
        x = np.asarray(x)
        if "var" in name:
            return x * rng.uniform(0.5, 2.0, x.shape).astype(x.dtype)
        if "mean" in name:
            return x + rng.normal(0, 0.3, x.shape).astype(x.dtype)
        return x

    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, config.latent_dim))
    lab = jax.nn.one_hot(jnp.zeros((BATCH,), jnp.int32), config.n_classes)
    code = jnp.zeros((BATCH, config.code_dim))

    def timed_fwd(apply_fn, label):
        def body(c):
            z, lab, code, acc = c
            out = apply_fn(z + acc * 1e-20, lab, code)
            probe = jnp.sum(jnp.square(out.astype(jnp.float32)))
            return (z, lab, code, acc + probe * 1e-20)

        dt = _timed_loop(body, (z, lab, code, jnp.float32(0)))
        ips = BATCH / dt
        print(f"{label}: {dt * 1e3:.3f} ms/batch, {ips:,.0f} img/s", flush=True)
        return {"ms_per_batch": dt * 1e3, "img_per_sec": ips}

    out = {"batch": BATCH}

    def exact_apply(z, lab, code):
        return gen.apply(variables, z, lab, code, train=False)

    out["exact_bf16"] = timed_fwd(exact_apply, "exact bf16 model.apply")
    out["folded_bf16"] = timed_fwd(
        make_celeba_infer(variables, quant="none"), "BN-folded bf16"
    )
    out["int8"] = timed_fwd(make_celeba_infer(variables, quant="int8"), "int8 mid layers")

    # fidelity alongside speed: int8 vs exact f32 on the same latents
    f32_ref = np.asarray(
        CelebaGenerator().apply(variables, z, lab, code, train=False)
    )
    int8_out = np.asarray(make_celeba_infer(variables, quant="int8")(z, lab, code))
    mse = float(np.mean((int8_out - f32_ref) ** 2))
    out["int8_psnr_db"] = 10 * np.log10(4.0 / mse)
    out["int8_speedup_vs_exact"] = (
        out["exact_bf16"]["ms_per_batch"] / out["int8"]["ms_per_batch"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
