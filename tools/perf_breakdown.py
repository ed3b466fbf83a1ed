#!/usr/bin/env python
"""Per-component TPU timing for the CelebA train step.

Times each phase of the step (and a pure-matmul FLOP-equivalent probe)
with the same fori_loop length-differencing harness as bench.py, so the
remote-execution tunnel's async dispatch cannot skew results.

Two XLA hazards this harness defeats (both produced ~0 ms readings in
earlier versions):

* dead-code elimination — every component returns a probe scalar that
  is folded into the carried accumulator and forced on the host;
* loop-invariant code motion — the accumulator perturbs one *input* of
  every iteration (``x + acc``), so the body cannot be hoisted out of
  the loop and iterations are serially dependent.

Output is one JSON line per component: {"name", "ms", "gflop",
"tflops"}; also written to /tmp/perf_breakdown.json.

Usage: python tools/perf_breakdown.py [--batch 128] [--only a,b,...]
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


def timed(fn, *args, steps=200, warmup=2, repeats=5):
    """``fn(acc, *args) -> probe array``; acc is a f32 scalar the body
    MUST fold into its computation's inputs (defeats hoisting).  Runs
    the body chained ``n`` times inside one jitted program and
    differences wall time between lengths 1 and 1+steps; repeats and
    takes the median."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, args):
        def body(i, carry):
            acc, a = carry
            out = fn(acc, *a)
            # full nonlinear reduction: XLA cannot narrow the producer to
            # a slice (as it would for out.ravel()[0]) nor factor the sum
            probe = jnp.sum(jnp.square(jnp.asarray(out).astype(jnp.float32)))
            return (acc + probe * 1e-20, a)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), args))

    def force(out):
        return float(out[0])

    for _ in range(warmup):
        force(run_n(1, args))
        force(run_n(1 + steps, args))

    estimates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        force(run_n(1, args))
        t1 = time.perf_counter()
        force(run_n(1 + steps, args))
        t2 = time.perf_counter()
        estimates.append(((t2 - t1) - (t1 - t0)) / steps)
    estimates.sort()
    return estimates[len(estimates) // 2]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--only", default=None, help="comma-separated component names")
    opt = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eadgan_tpu.losses import bce_loss
    from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
    from eadgan_tpu.ops import warp_affine
    from eadgan_tpu.train.config import CelebaConfig
    from eadgan_tpu.train.gan_celeba import (
        init_celeba_gan_state,
        make_celeba_gan_step,
    )
    from eadgan_tpu.train.state import apply_model
    from eadgan_tpu.transforms import RPQXY, code_to_matrix

    B = opt.batch
    config = CelebaConfig(batch_size=B)
    gen_m = CelebaGenerator(dtype=jnp.bfloat16)
    dis_m = CelebaDiscriminator(dtype=jnp.bfloat16)
    state = init_celeba_gan_state(gen_m, dis_m, config, jax.random.PRNGKey(0))
    step = make_celeba_gan_step(gen_m, dis_m, config)

    imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, 64, 64, 3), minval=-1, maxval=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (B, config.latent_dim))
    code = jax.random.uniform(jax.random.PRNGKey(3), (B, config.code_dim), minval=-1, maxval=1)
    labels = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), config.n_classes)

    # FLOP model (fwd only; bwd ~2x fwd for convs)
    def conv_gflop(b, hw, cin, cout, k):
        return 2 * b * hw * hw * cin * cout * k * k / 1e9

    g_fwd = (
        conv_gflop(B, 4, 218, 1024, 4) / 4
        + conv_gflop(B, 8, 1024, 512, 4)
        + conv_gflop(B, 16, 512, 256, 4)
        + conv_gflop(B, 32, 256, 128, 4)
        + conv_gflop(B, 64, 128, 3, 4)
    )
    d_fwd = (
        conv_gflop(B, 32, 3, 128, 4)
        + conv_gflop(B, 16, 128, 256, 4)
        + conv_gflop(B, 8, 256, 512, 4)
        + conv_gflop(B, 4, 512, 1024, 4)
        + 2 * B * 19 * 1024 * 16 / 1e9
    )

    results = {}

    def report(name, dt, gflop):
        row = {
            "name": name,
            "ms": round(dt * 1e3, 4),
            "gflop": round(gflop, 1),
            "tflops": round(gflop / 1e3 / dt, 1) if gflop else None,
        }
        results[name] = row
        print(json.dumps(row), flush=True)

    only = set(opt.only.split(",")) if opt.only else None

    def want(name):
        return only is None or name in only

    if want("full_step"):
        # state evolves every iteration -> no hoisting risk here
        def full(acc, st, imgs):
            st2, m = step(st, imgs + acc * 0)
            return m["d_loss"]

        # thread the true state through via a dedicated loop
        @jax.jit
        def run_full(n, st, imgs):
            def body(i, carry):
                st, acc = carry
                st2, m = step(st, imgs)
                return (st2, acc + m["d_loss"] * 1e-12)

            return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))

        def force(out):
            return float(out[1])

        for _ in range(2):
            force(run_full(1, state, imgs))
            force(run_full(41, state, imgs))
        est = []
        for _ in range(5):
            t0 = time.perf_counter()
            force(run_full(1, state, imgs))
            t1 = time.perf_counter()
            force(run_full(41, state, imgs))
            t2 = time.perf_counter()
            est.append(((t2 - t1) - (t1 - t0)) / 40)
        est.sort()
        report("full_step", est[2], 2085.0 * B / 128.0)

    if want("g_fwd"):
        def g_fwd_fn(acc, gvars, z, labels, code):
            out, _ = apply_model(gen_m, gvars, z + acc, labels, code)
            return out

        dt = timed(g_fwd_fn, state.g, z, labels, code, steps=500)
        report("g_fwd", dt, g_fwd)

    if want("d_fwd"):
        def d_fwd_fn(acc, dvars, imgs):
            (_, _, validity), _ = apply_model(dis_m, dvars, imgs + acc)
            return validity

        dt = timed(d_fwd_fn, state.d, imgs, steps=500)
        report("d_fwd", dt, d_fwd)

    if want("g_phase"):
        def g_phase(acc, st, z, labels, code):
            def loss_fn(g_params):
                gen, _ = apply_model(
                    gen_m, st.g.replace(params=g_params), z + acc, labels, code
                )
                (_, _, validity), _ = apply_model(dis_m, st.d, gen)
                return bce_loss(validity, jnp.ones_like(validity))

            loss, grads = jax.value_and_grad(loss_fn)(st.g.params)
            gprobe = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
            return loss + gprobe * 1e-20

        dt = timed(g_phase, state, z, labels, code, steps=200)
        report("g_phase", dt, 3 * (g_fwd + d_fwd))

    if want("d_phase"):
        def d_phase(acc, st, imgs):
            def loss_fn(d_params):
                dv = st.d.replace(params=d_params)
                (_, _, rp), _ = apply_model(dis_m, dv, imgs + acc)
                (_, _, fp), _ = apply_model(dis_m, dv, imgs - acc)
                return bce_loss(rp, jnp.ones_like(rp)) + bce_loss(fp, jnp.zeros_like(fp))

            loss, grads = jax.value_and_grad(loss_fn)(st.d.params)
            gprobe = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
            return loss + gprobe * 1e-20

        dt = timed(d_phase, state, imgs, steps=200)
        report("d_phase", dt, 2 * 3 * d_fwd)

    if want("warp"):
        def warp_fn(acc, imgs, code):
            m = code_to_matrix(RPQXY, code[:, :5] + acc * 0)
            return warp_affine(imgs + acc, m, padding_mode="border")

        dt = timed(warp_fn, imgs, code, steps=500)
        report("warp", dt, 0.0)

    if want("matmul_probe"):
        a = jax.random.normal(jax.random.PRNGKey(5), (8192, 8192), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(6), (8192, 8192), jnp.bfloat16)

        def mm(acc, a, b):
            return jnp.dot(a + acc.astype(jnp.bfloat16), b,
                           preferred_element_type=jnp.bfloat16)

        dt = timed(mm, a, b, steps=200)
        report("matmul_probe", dt, 2 * 8192**3 / 1e9)

    if want("d_conv1"):
        import flax.linen as nn

        from eadgan_tpu.models.layers import SNConv

        class C1(nn.Module):
            @nn.compact
            def __call__(self, x):
                return SNConv(128, 4, 2, 1, dtype=jnp.bfloat16)(x, update_stats=False)

        c1 = C1()
        v1 = c1.init(jax.random.PRNGKey(7), imgs)

        def c1_fn(acc, v1, imgs):
            return c1.apply(v1, imgs + acc)

        dt = timed(c1_fn, v1, imgs, steps=1000)
        report("d_conv1", dt, conv_gflop(B, 32, 3, 128, 4))

    if want("g_convt_last"):
        import flax.linen as nn

        from eadgan_tpu.models.layers import TorchConvTranspose

        class CT(nn.Module):
            @nn.compact
            def __call__(self, x):
                return TorchConvTranspose(3, 4, 2, 1, dtype=jnp.bfloat16)(x)

        ct = CT()
        x32 = jax.random.normal(jax.random.PRNGKey(8), (B, 32, 32, 128), jnp.bfloat16)
        vt = ct.init(jax.random.PRNGKey(9), x32)

        def ct_fn(acc, vt, x32):
            return ct.apply(vt, x32 + acc.astype(jnp.bfloat16))

        dt = timed(ct_fn, vt, x32, steps=1000)
        report("g_convt_last", dt, conv_gflop(B, 64, 128, 3, 4))

    with open("/tmp/perf_breakdown.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
