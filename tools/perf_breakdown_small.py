#!/usr/bin/env python
"""Per-phase TPU timing for the SMALL pipelines (dSprites rp, MNIST).

Round-2 verdict: both steps sit below their own roofline bounds
(dSprites 1.72 ms vs 0.29 compute / 1.53 bytes-upper; MNIST 1.84 vs
0.88 / 2.24) with the overhead unattributed.  This tool reconstructs
each phase of the two steps (same library calls the step bodies make —
train/gan_dsprites.py, train/gan_mnist.py) and times every phase with
the fori_loop length-differencing harness from tools/perf_breakdown.py,
then reports the sum-of-phases vs the full step: the residual is the
phase-seam / optimizer / bookkeeping cost the roofline misses.

Output: one JSON line per component + a summary line per pipeline;
written to /tmp/perf_breakdown_small.json.

Usage: python tools/perf_breakdown_small.py [--batch 128]
       [--pipeline dsprites|mnist|both] [--only a,b,...]
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


def timed(fn, *args, steps=500, warmup=2, repeats=5):
    """Same anti-DCE / anti-hoisting harness as tools/perf_breakdown.py."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, args):
        def body(i, carry):
            acc, a = carry
            out = fn(acc, *a)
            probe = jnp.sum(jnp.square(jnp.asarray(out).astype(jnp.float32)))
            return (acc + probe * 1e-20, a)

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), args))

    def force(out):
        return float(out[0])

    for _ in range(warmup):
        force(run_n(1, args))
        force(run_n(1 + steps, args))
    est = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        force(run_n(1, args))
        t1 = time.perf_counter()
        force(run_n(1 + steps, args))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / steps)
    est.sort()
    return est[len(est) // 2]


def timed_carry(fn, carry, *args, steps=300):
    """Time ``fn(carry, *args) -> (new_carry, probe)`` with the carry fed
    back each iteration — the SERIAL measurement.  The plain ``timed``
    harness keeps params constant across iterations, so consecutive
    iterations are data-independent and the TPU pipelines them
    concurrently, UNDER-reporting a phase's cost inside the real step
    (whose carried params serialize every iteration)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, carry, args):
        def body(i, c):
            carry, acc = c
            new_carry, probe = fn(carry, *args)
            return (new_carry, acc + probe * 1e-12)

        return jax.lax.fori_loop(0, n, body, (carry, jnp.float32(0)))

    def force(out):
        return float(out[1])

    for _ in range(2):
        force(run_n(1, carry, args))
        force(run_n(1 + steps, carry, args))
    est = []
    for _ in range(5):
        t0 = time.perf_counter()
        force(run_n(1, carry, args))
        t1 = time.perf_counter()
        force(run_n(1 + steps, carry, args))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / steps)
    est.sort()
    return est[len(est) // 2]


def timed_step(step, state, *batch, steps=200):
    """Full train step: thread the true state through the loop."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, st, batch):
        def body(i, carry):
            st, acc = carry
            st2, m = step(st, *batch)
            probe = sum(jnp.asarray(v, jnp.float32) for v in m.values())
            return (st2, acc + probe * 1e-12)

        return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))

    def force(out):
        return float(out[1])

    for _ in range(2):
        force(run_n(1, state, batch))
        force(run_n(1 + steps, state, batch))
    est = []
    for _ in range(5):
        t0 = time.perf_counter()
        force(run_n(1, state, batch))
        t1 = time.perf_counter()
        force(run_n(1 + steps, state, batch))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / steps)
    est.sort()
    return est[len(est) // 2]


def bench_dsprites(B, report, want):
    import jax
    import jax.numpy as jnp
    import optax

    from eadgan_tpu.losses import bce_loss, mse_loss, mutual_info_loss
    from eadgan_tpu.models import (
        SpritesDiscriminator,
        SpritesEncoder,
        SpritesEncoderPxy,
        SpritesGenerator,
    )
    from eadgan_tpu.ops import warp_affine
    from eadgan_tpu.train.config import SpritesGanConfig
    from eadgan_tpu.train.gan_dsprites import (
        align_images,
        distort_images,
        init_sprites_gan_state,
        make_sprites_gan_step,
    )
    from eadgan_tpu.train.state import adam, apply_model, ModelVars
    from eadgan_tpu.transforms import RP, code_to_matrix, regularize

    config = SpritesGanConfig(batch_size=B)
    g = SpritesGenerator(channels=1)
    d = SpritesDiscriminator(channels=1)
    e = SpritesEncoder(n_classes=config.n_classes, code_dim=config.code_dim, channels=1)
    pxy = SpritesEncoderPxy(out_dim=3, channels=1)
    pxy_vars = pxy.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    state = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
    step = make_sprites_gan_step(g, d, e, pxy, config)

    img = jax.random.uniform(jax.random.PRNGKey(2), (B, 64, 64, 1))
    code = jax.random.uniform(jax.random.PRNGKey(3), (B, config.code_dim), minval=-1, maxval=1)
    onehot = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), config.n_classes)
    z_c = jnp.concatenate([onehot, code], axis=-1)
    align_img = jax.block_until_ready(align_images(pxy, state.pxy, img, config))
    trans_img = jax.block_until_ready(distort_images(align_img, code, config))
    gen_imgs, _ = apply_model(g, state.g, z_c)
    gen_imgs = jax.block_until_ready(gen_imgs)
    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.lr, config.b1, config.b2)

    if want("full_step"):
        report("ds_full_step", timed_step(step, state, img))

    if want("align"):
        def f(acc, pxy_v, img):
            return align_images(pxy, pxy_v, img + acc, config)

        report("ds_align", timed(f, state.pxy, img))

    if want("warp"):
        def f(acc, img, code):
            m = code_to_matrix(RP, code[:, :4] + acc * 0)
            return warp_affine(img + acc, m, padding_mode="border")

        report("ds_warp_single", timed(f, img, code))

    if want("g_fwd"):
        def f(acc, gv, z_c):
            out, _ = apply_model(g, gv, z_c + acc)
            return out

        report("ds_g_fwd", timed(f, state.g, z_c))

    if want("e_fwd"):
        def f(acc, ev, img):
            (cat, cont), _ = apply_model(e, ev, img + acc)
            return cont

        report("ds_e_fwd", timed(f, state.e, img))

    if want("d_phase"):
        def f(acc, st, trans_img, gen_imgs):
            def loss_fn(d_params):
                dv = st.d.replace(params=d_params)
                d_real, ds = apply_model(d, dv, trans_img + acc)
                d_fake, ds = apply_model(d, dv.replace(stats=ds), gen_imgs)
                return (
                    bce_loss(d_real, jnp.ones_like(d_real))
                    + bce_loss(d_fake, jnp.zeros_like(d_fake))
                ) / 2.0, ds

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.d.params)
            up, _ = tx_d.update(grads, st.opt_d, st.d.params)
            probe = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(optax.apply_updates(st.d.params, up))
            )
            return loss + probe * 1e-20

        report("ds_d_phase+adam", timed(f, state, trans_img, gen_imgs, steps=300))

    if want("info_phase"):
        def f(acc, st, align_img, trans_img, z_c, code, onehot):
            def loss_fn(params):
                gv = st.g.replace(params=params["g"])
                ev = st.e.replace(params=params["e"])
                gen, _ = apply_model(g, gv, z_c + acc)
                (rec_cat, rec_cont), es = apply_model(e, ev, gen)
                g_fake, _ = apply_model(d, st.d, gen)
                g_loss = bce_loss(g_fake, jnp.ones_like(g_fake))
                cat_loss = mutual_info_loss(rec_cat, onehot)
                cont_loss = mse_loss(rec_cont, code)
                (a_cat, a_cont), es = apply_model(e, ev.replace(stats=es), align_img)
                (t_cat, t_cont), es = apply_model(e, ev.replace(stats=es), trans_img)
                rec = regularize(RP, a_cont[:, :4], t_cont[:, :4])
                affine_loss = mse_loss(rec, code)
                rel = mutual_info_loss(t_cat, jax.lax.stop_gradient(a_cat))
                return cat_loss + cont_loss + affine_loss + g_loss + rel

            params = {"g": st.g.params, "e": st.e.params}
            loss, grads = jax.value_and_grad(loss_fn)(params)
            up, _ = tx_info.update(grads, st.opt_info, params)
            probe = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(optax.apply_updates(params, up))
            )
            return loss + probe * 1e-20

        report(
            "ds_info_phase+adam",
            timed(f, state, align_img, trans_img, z_c, code, onehot, steps=300),
        )

    if want("serial"):
        # Serial-carry phase timings: params update feeds the next
        # iteration, as in the real step.  The delta vs the constant-
        # param ``timed`` rows is cross-iteration pipelining the
        # isolated measurements wrongly enjoy.
        def f(carry, trans_img, gen_imgs):
            d_params, opt_d_s = carry

            def loss_fn(dp):
                dv = state.d.replace(params=dp)
                d_real, ds = apply_model(d, dv, trans_img)
                d_fake, ds = apply_model(d, dv.replace(stats=ds), gen_imgs)
                return (
                    bce_loss(d_real, jnp.ones_like(d_real))
                    + bce_loss(d_fake, jnp.zeros_like(d_fake))
                ) / 2.0, ds

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
            up, opt_d_s = tx_d.update(grads, opt_d_s, d_params)
            return (optax.apply_updates(d_params, up), opt_d_s), loss

        report(
            "ds_d_phase_serial",
            timed_carry(f, (state.d.params, state.opt_d), trans_img, gen_imgs),
        )

        def f2(carry, align_img, trans_img, z_c, code, onehot):
            params, opt_i = carry

            def loss_fn(params):
                gv = state.g.replace(params=params["g"])
                ev = state.e.replace(params=params["e"])
                gen, _ = apply_model(g, gv, z_c)
                (rec_cat, rec_cont), es = apply_model(e, ev, gen)
                g_fake, _ = apply_model(d, state.d, gen)
                g_loss = bce_loss(g_fake, jnp.ones_like(g_fake))
                cat_loss = mutual_info_loss(rec_cat, onehot)
                cont_loss = mse_loss(rec_cont, code)
                (a_cat, a_cont), es = apply_model(e, ev.replace(stats=es), align_img)
                (t_cat, t_cont), es = apply_model(e, ev.replace(stats=es), trans_img)
                rec = regularize(RP, a_cont[:, :4], t_cont[:, :4])
                affine_loss = mse_loss(rec, code)
                rel = mutual_info_loss(t_cat, jax.lax.stop_gradient(a_cat))
                return cat_loss + cont_loss + affine_loss + g_loss + rel

            loss, grads = jax.value_and_grad(loss_fn)(params)
            up, opt_i = tx_info.update(grads, opt_i, params)
            return (optax.apply_updates(params, up), opt_i), loss

        report(
            "ds_info_phase_serial",
            timed_carry(
                f2,
                ({"g": state.g.params, "e": state.e.params}, state.opt_info),
                align_img, trans_img, z_c, code, onehot,
            ),
        )

    if want("ablate"):
        # Ablations on the REAL step — the deltas attribute what the
        # reconstructed phases structurally miss (loop-carry bookkeeping,
        # in-step RNG sampling, warps in fused context vs isolated).

        # (a) carry-only: thread the identical state pytree through the
        # fori_loop with no compute — the harness/engine floor.
        def carry_body(st, im):
            return st.replace(step=st.step + 1), {
                "d_loss": jnp.sum(im) * jnp.float32(1e-9)
            }

        report("ds_carry_only", timed_step(carry_body, state, img))

        # (b) fixed injected codes: the step minus its two in-step
        # sample_inputs draws (split + uniform + randint + one_hot).
        code2 = jax.random.uniform(
            jax.random.PRNGKey(7), (B, config.code_dim), minval=-1, maxval=1
        )
        fixed = {
            "code_d": code, "onehot_d": onehot,
            "code_i": code2, "onehot_i": onehot,
        }
        body = make_sprites_gan_step(g, d, e, pxy, config, jit=False)

        def step_fixed(st, im):
            return body(st, im, fixed=fixed)

        report("ds_full_step_fixed", timed_step(step_fixed, state, img))

        # (c) identity warps: the step minus all three warp_affine calls
        # (align inverse + two distorts), measured IN CONTEXT — compare
        # against 3x ds_warp_single for fusion-seam effects.
        import eadgan_tpu.train.gan_dsprites as _gd

        orig_warp = _gd.warp_affine
        try:
            _gd.warp_affine = lambda im, m, padding_mode="zeros": im
            step_nowarp = make_sprites_gan_step(g, d, e, pxy, config)
            report("ds_full_step_nowarp", timed_step(step_nowarp, state, img))
        finally:
            _gd.warp_affine = orig_warp


def bench_mnist(B, report, want):
    import jax
    import jax.numpy as jnp
    import optax

    from eadgan_tpu.losses import mse_loss, torch_cross_entropy
    from eadgan_tpu.models import (
        AffineApproximator,
        MnistDiscriminator,
        MnistEncoder,
        MnistGenerator,
    )
    from eadgan_tpu.ops import warp_affine
    from eadgan_tpu.train.config import MnistConfig
    from eadgan_tpu.train.gan_mnist import init_mnist_gan_state, make_mnist_gan_step
    from eadgan_tpu.train.state import adam, apply_model, ModelVars
    from eadgan_tpu.transforms import RPQMNXY, code_to_matrix, regularize_neural

    config = MnistConfig(batch_size=B)
    g = MnistGenerator()
    d = MnistDiscriminator()
    e = MnistEncoder()
    approx = AffineApproximator()
    approx_vars = approx.init(jax.random.PRNGKey(1), jnp.zeros((1, 6)))
    state = init_mnist_gan_state(g, d, e, approx_vars, config, jax.random.PRNGKey(0))
    step = make_mnist_gan_step(g, d, e, approx, config)

    img = jax.random.uniform(jax.random.PRNGKey(2), (B, 32, 32, 1), minval=-1, maxval=1)
    labels = jnp.zeros((B,), jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(3), (B, config.latent_dim))
    code = jax.random.uniform(jax.random.PRNGKey(4), (B, config.code_dim), minval=-1, maxval=1)
    label_input = jax.nn.one_hot(labels, config.n_classes)
    matrix = code_to_matrix(RPQMNXY, code)
    scaled = jax.block_until_ready(warp_affine(img, matrix, padding_mode="border"))
    gen_imgs, _ = apply_model(g, state.g, z, label_input, code)
    gen_imgs = jax.block_until_ready(gen_imgs)
    tx = adam(config.lr, config.b1, config.b2)
    tx_d = adam(config.d_lr, config.b1, config.b2)

    if want("full_step"):
        report("mn_full_step", timed_step(step, state, img, labels))

    if want("warp"):
        def f(acc, img, code):
            m = code_to_matrix(RPQMNXY, code + acc * 0)
            return warp_affine(img + acc, m, padding_mode="border")

        report("mn_warp", timed(f, img, code))

    if want("g_phase"):
        def f(acc, st, z, label_input, code):
            def loss_fn(g_params):
                gen, _ = apply_model(
                    g, st.g.replace(params=g_params), z + acc, label_input, code
                )
                validity, _ = apply_model(d, st.d, gen)
                return mse_loss(validity, jnp.ones_like(validity))

            loss, grads = jax.value_and_grad(loss_fn)(st.g.params)
            up, _ = tx.update(grads, st.opt_g, st.g.params)
            probe = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(optax.apply_updates(st.g.params, up))
            )
            return loss + probe * 1e-20

        report("mn_g_phase+adam", timed(f, state, z, label_input, code, steps=300))

    if want("d_phase"):
        def f(acc, st, scaled, gen_imgs):
            def loss_fn(d_params):
                dv = st.d.replace(params=d_params)
                rp, ds = apply_model(d, dv, scaled + acc)
                fp, ds = apply_model(d, dv.replace(stats=ds), gen_imgs)
                return (
                    mse_loss(rp, jnp.ones_like(rp))
                    + mse_loss(fp, jnp.zeros_like(fp))
                ) / 2.0

            loss, grads = jax.value_and_grad(loss_fn)(st.d.params)
            up, _ = tx_d.update(grads, st.opt_d, st.d.params)
            probe = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(optax.apply_updates(st.d.params, up))
            )
            return loss + probe * 1e-20

        report("mn_d_phase+adam", timed(f, state, scaled, gen_imgs, steps=300))

    if want("info_phase"):
        def f(acc, st, z, label_input, code, labels, scaled, img):
            def loss_fn(params):
                gv = st.g.replace(params=params["g"])
                ev = st.e.replace(params=params["e"])
                gen, _ = apply_model(g, gv, z + acc, label_input, code)
                (pl, pc, _), es = apply_model(e, ev, gen)
                info_1 = config.lambda_cat * torch_cross_entropy(
                    pl, labels
                ) + config.lambda_con * mse_loss(pc, code)
                (_, tc, _), es = apply_model(e, ev.replace(stats=es), scaled)
                (_, rc, _), es = apply_model(e, ev.replace(stats=es), img)
                pred = regularize_neural(
                    approx, st.approx.as_variables(), rc, tc
                )
                return info_1 + config.lambda_affine * mse_loss(pred, code)

            params = {"g": st.g.params, "e": st.e.params}
            loss, grads = jax.value_and_grad(loss_fn)(params)
            up, _ = tx.update(grads, st.opt_info, params)
            probe = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(optax.apply_updates(params, up))
            )
            return loss + probe * 1e-20

        report(
            "mn_info_phase+adam",
            timed(f, state, z, label_input, code, labels, scaled, img, steps=300),
        )

    if want("serial"):
        # Serial-carry phase timings (see the dSprites section): updated
        # params feed the next iteration, as in the real step, so the
        # TPU cannot pipeline data-independent iterations.
        def fg(carry, z, label_input, code):
            g_params, opt_g = carry

            def loss_fn(g_params):
                gen, _ = apply_model(
                    g, state.g.replace(params=g_params), z, label_input, code
                )
                validity, _ = apply_model(d, state.d, gen)
                return mse_loss(validity, jnp.ones_like(validity))

            loss, grads = jax.value_and_grad(loss_fn)(g_params)
            up, opt_g = tx.update(grads, opt_g, g_params)
            return (optax.apply_updates(g_params, up), opt_g), loss

        report(
            "mn_g_phase_serial",
            timed_carry(fg, (state.g.params, state.opt_g), z, label_input, code),
        )

        def fd(carry, scaled, gen_imgs):
            d_params, opt_d = carry

            def loss_fn(d_params):
                dv = state.d.replace(params=d_params)
                rp, ds = apply_model(d, dv, scaled)
                fp, ds = apply_model(d, dv.replace(stats=ds), gen_imgs)
                return (
                    mse_loss(rp, jnp.ones_like(rp))
                    + mse_loss(fp, jnp.zeros_like(fp))
                ) / 2.0

            loss, grads = jax.value_and_grad(loss_fn)(d_params)
            up, opt_d = tx_d.update(grads, opt_d, d_params)
            return (optax.apply_updates(d_params, up), opt_d), loss

        report(
            "mn_d_phase_serial",
            timed_carry(fd, (state.d.params, state.opt_d), scaled, gen_imgs),
        )

        def fi(carry, z, label_input, code, labels, scaled, img):
            params, opt_i = carry

            def loss_fn(params):
                gv = state.g.replace(params=params["g"])
                ev = state.e.replace(params=params["e"])
                gen, _ = apply_model(g, gv, z, label_input, code)
                (pl, pc, _), es = apply_model(e, ev, gen)
                info_1 = config.lambda_cat * torch_cross_entropy(
                    pl, labels
                ) + config.lambda_con * mse_loss(pc, code)
                (_, tc, _), es = apply_model(e, ev.replace(stats=es), scaled)
                (_, rc, _), es = apply_model(e, ev.replace(stats=es), img)
                pred = regularize_neural(
                    approx, state.approx.as_variables(), rc, tc
                )
                return info_1 + config.lambda_affine * mse_loss(pred, code)

            params_in = params
            loss, grads = jax.value_and_grad(loss_fn)(params_in)
            up, opt_i = tx.update(grads, opt_i, params_in)
            return (optax.apply_updates(params_in, up), opt_i), loss

        report(
            "mn_info_phase_serial",
            timed_carry(
                fi,
                ({"g": state.g.params, "e": state.e.params}, state.opt_info),
                z, label_input, code, labels, scaled, img,
            ),
        )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--pipeline", choices=["dsprites", "mnist", "both"], default="both")
    parser.add_argument("--only", default=None)
    opt = parser.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("EADGAN_COMPILE_CACHE", "/tmp/eadgan_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    only = set(opt.only.split(",")) if opt.only else None

    def want(name):
        return only is None or name in only

    results = {}

    def report(name, dt):
        row = {"name": name, "ms": round(dt * 1e3, 4)}
        results[name] = row
        print(json.dumps(row), flush=True)

    if opt.pipeline in ("dsprites", "both"):
        bench_dsprites(opt.batch, report, want)
        phases = [k for k in results if k.startswith("ds_") and
                  ("phase" in k or k == "ds_align")]
        # When the serial-carry variants ran, they REPLACE the constant-
        # param ones in the accounting (the real step carries params
        # serially, so the serial number is the in-context cost; summing
        # both double-counts the phase).
        if "ds_d_phase_serial" in results:
            phases = [k for k in phases
                      if k not in ("ds_d_phase+adam", "ds_info_phase+adam")]
        if "ds_full_step" in results and phases:
            total = sum(results[k]["ms"] for k in phases)
            full = results["ds_full_step"]["ms"]
            # Components the real step runs OUTSIDE the three timed
            # phases (train/gan_dsprites.py): the D-phase G forward
            # (gen_imgs) and the two distort warps (trans_img,
            # trans_img_i); the align warp is inside ds_align.
            extras = {}
            if "ds_g_fwd" in results:
                extras["g_fwd"] = results["ds_g_fwd"]["ms"]
            if "ds_warp_single" in results:
                extras["distort_warps_x2"] = 2 * results["ds_warp_single"]["ms"]
            accounted = total + sum(extras.values())
            summary = {
                "pipeline": "dsprites",
                "full_step_ms": full,
                "sum_of_phases_ms": round(total, 4),
                "phases": phases,
                "extras_ms": {k: round(v, 4) for k, v in extras.items()},
                "accounted_ms": round(accounted, 4),
                "residual_ms": round(full - accounted, 4),
            }
            for abl in (
                "ds_carry_only", "ds_full_step_fixed", "ds_full_step_nowarp",
                "ds_d_phase_serial", "ds_info_phase_serial",
            ):
                if abl in results:
                    summary[abl + "_ms"] = results[abl]["ms"]
            results["ds_summary"] = summary
            print(json.dumps(summary), flush=True)

    if opt.pipeline in ("mnist", "both"):
        bench_mnist(opt.batch, report, want)
        phases = [k for k in results if k.startswith("mn_") and "phase" in k]
        # Serial-carry rows replace the constant-param ones in the
        # accounting (same reasoning as the dSprites summary above).
        if "mn_d_phase_serial" in results:
            phases = [k for k in phases
                      if k not in ("mn_g_phase+adam", "mn_d_phase+adam",
                                   "mn_info_phase+adam")]
        if "mn_full_step" in results and phases:
            total = sum(results[k]["ms"] for k in phases)
            full = results["mn_full_step"]["ms"]
            # the real step also runs one distort warp outside the phases
            extras = {}
            if "mn_warp" in results:
                extras["distort_warp"] = results["mn_warp"]["ms"]
            accounted = total + sum(extras.values())
            summary = {
                "pipeline": "mnist",
                "full_step_ms": full,
                "sum_of_phases_ms": round(total, 4),
                "phases": phases,
                "extras_ms": {k: round(v, 4) for k, v in extras.items()},
                "accounted_ms": round(accounted, 4),
                "residual_ms": round(full - accounted, 4),
            }
            results["mn_summary"] = summary
            print(json.dumps(summary), flush=True)

    with open("/tmp/perf_breakdown_small.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
