"""Benchmark harness.

Default (driver contract): runs the complete three-phase CelebA training
step (the reference's heaviest pipeline) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

``--suite`` additionally benches the dSprites rp step, the MNIST step,
and pure generator inference (the unreported BASELINE.md:23 row), prints
one JSON line each, and writes BENCH_SUITE.json.

``vs_baseline`` compares against the measured reference-PyTorch
throughput on this host (BASELINE_MEASURED.json, produced by
tools/bench_torch_reference.py — CPU torch is all this container has;
the reference publishes no numbers of its own, see BASELINE.md).

Measurement: N steps are chained inside ONE device program
(``lax.fori_loop``) and two lengths are differenced — the remote
-execution tunnel's ``block_until_ready`` returns early and naive
per-call timing both adds ~35 ms latency and can report buffers ready
before the chain has executed.
"""

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))

# Production fast path: bf16 MXU passes in the warp kernel (~6e-3 pixel
# error — immaterial for training; the exact 'highest' mode stays the
# library default for parity work).
os.environ.setdefault("EADGAN_WARP_PRECISION", "fast")


def _timed_loop(step_like, init_carry, steps=STEPS, warmup=WARMUP, repeats=5):
    """Time one carried step function by fori_loop length differencing.

    ``step_like(carry) -> carry`` must make every iteration's work feed
    the carry (train steps do: the whole updated state is the loop
    output, so XLA can neither DCE the body nor hoist it).  The chain
    is auto-lengthened so each timed program runs >= ~0.5 s of device
    time, and the median of ``repeats`` difference estimates is
    returned — the tunnel's ~35 ms dispatch jitter would otherwise
    dominate sub-ms steps (see tools/perf_breakdown.py for the full
    hazard list).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, carry):
        return jax.lax.fori_loop(0, n, lambda i, c: step_like(c), carry)

    def force(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])

    for _ in range(warmup):
        force(run_n(1, init_carry))

    def estimate(n):
        t0 = time.perf_counter()
        force(run_n(1, init_carry))
        t1 = time.perf_counter()
        force(run_n(1 + n, init_carry))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / n

    dt = estimate(steps)
    # Tunnel timing jitter can drive a difference estimate negative on a
    # fast step; re-estimate rather than letting dt<0 explode the
    # auto-lengthened chain to the 20000-step cap.
    for _ in range(3):
        if dt > 0:
            break
        dt = estimate(steps)
    if dt <= 0:
        dt = 1e-4  # all retries jittered: assume a fast step, bounded chain
    # lengthen the chain until the measured program is >= ~0.5 s
    if dt * steps < 0.5:
        steps = min(int(0.6 / dt), 20000)
        estimate(steps)  # warm the new trip count
    ests = sorted(estimate(steps) for _ in range(repeats))
    return ests[len(ests) // 2]


def _compute_dtype(jnp):
    """BENCH_DTYPE env -> model compute dtype (None = full f32)."""
    name = os.environ.get("BENCH_DTYPE", "bfloat16")
    return None if name == "float32" else getattr(jnp, name)


def _row(metric, ips, baseline_key):
    ref = _baseline(baseline_key)
    return {
        "metric": metric,
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / ref, 2) if ref else None,
    }


def _baseline(key):
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f).get(key)
    return None


def bench_celeba():
    import jax
    import jax.numpy as jnp

    from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
    from eadgan_tpu.train.config import CelebaConfig
    from eadgan_tpu.train.gan_celeba import init_celeba_gan_state, make_celeba_gan_step

    compute_dtype = _compute_dtype(jnp)

    config = CelebaConfig(batch_size=BATCH)
    generator = CelebaGenerator(dtype=compute_dtype)
    discriminator = CelebaDiscriminator(dtype=compute_dtype)
    state = init_celeba_gan_state(generator, discriminator, config, jax.random.PRNGKey(0))
    step = make_celeba_gan_step(generator, discriminator, config)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, 64, 64, 3), minval=-1.0, maxval=1.0
    )

    dt = _timed_loop(lambda c: (step(c[0], c[1])[0], c[1]), (state, imgs))
    return _row("celeba_train_images_per_sec_per_chip", BATCH / dt, "celeba_train_images_per_sec")


def bench_dsprites():
    import jax
    import jax.numpy as jnp

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

    compute_dtype = _compute_dtype(jnp)

    config = SpritesGanConfig(batch_size=BATCH)
    g, d, e, pxy = (
        SpritesGenerator(dtype=compute_dtype),
        SpritesDiscriminator(dtype=compute_dtype),
        SpritesEncoder(dtype=compute_dtype),
        SpritesEncoderPxy(),
    )
    pxy_vars = pxy.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    state = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
    step = make_sprites_gan_step(g, d, e, pxy, config)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, 64, 64, 1))

    dt = _timed_loop(lambda c: (step(c[0], c[1])[0], c[1]), (state, imgs))
    return _row("dsprites_rp_train_images_per_sec_per_chip", BATCH / dt, "dsprites_train_images_per_sec")


def bench_mnist():
    import jax
    import jax.numpy as jnp

    from eadgan_tpu.models import (
        AffineApproximator,
        MnistDiscriminator,
        MnistEncoder,
        MnistGenerator,
    )
    from eadgan_tpu.train.config import MnistConfig
    from eadgan_tpu.train.gan_mnist import init_mnist_gan_state, make_mnist_gan_step

    compute_dtype = _compute_dtype(jnp)

    config = MnistConfig(batch_size=BATCH)
    g = MnistGenerator(dtype=compute_dtype)
    d = MnistDiscriminator(dtype=compute_dtype)
    e = MnistEncoder(dtype=compute_dtype)
    approx = AffineApproximator()
    approx_vars = approx.init(jax.random.PRNGKey(1), jnp.zeros((1, 6)))
    state = init_mnist_gan_state(g, d, e, approx_vars, config, jax.random.PRNGKey(0))
    step = make_mnist_gan_step(g, d, e, approx, config)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(2), (BATCH, 32, 32, 1), minval=-1.0, maxval=1.0
    )
    labels = jnp.zeros((BATCH,), jnp.int32)

    dt = _timed_loop(lambda c: (step(c[0], c[1], c[2])[0], c[1], c[2]), (state, imgs, labels))
    return _row("mnist_train_images_per_sec_per_chip", BATCH / dt, "mnist_train_images_per_sec")


def bench_generate():
    """Generated imgs/sec — the BASELINE.md:23 'report' row.  Pure
    CelebA generator forward (eval-mode BN) at inference batch."""
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
    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, config.latent_dim))
    lab = jax.nn.one_hot(jnp.zeros((BATCH,), jnp.int32), config.n_classes)
    code = jnp.zeros((BATCH, config.code_dim))

    def fwd(c):
        # Accumulator pattern from tools/perf_breakdown.py: the probe is
        # a full nonlinear reduction of the output (XLA cannot narrow
        # the generator to a slice or DCE it) and it perturbs the next
        # iteration's input (cannot be hoisted out of the loop).  A
        # `* 0` feedback here previously let XLA skip the forward
        # entirely and report an above-peak number.
        z, lab, code, acc = c
        out = gen.apply(variables, z + acc * 1e-20, lab, code, train=False)
        probe = jnp.sum(jnp.square(out.astype(jnp.float32)))
        return (z, lab, code, acc + probe * 1e-20)

    dt = _timed_loop(fwd, (z, lab, code, jnp.float32(0)))
    return _row("celeba_generate_images_per_sec_per_chip", BATCH / dt, "celeba_generate_images_per_sec")


def main() -> None:
    import jax

    # Persistent compile cache: the full-train-step compile through the
    # remote-compile tunnel costs minutes; cache it across runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    suite = "--suite" in sys.argv
    benches = [bench_celeba]
    if suite:
        benches += [bench_dsprites, bench_mnist, bench_generate]
    rows = []
    for fn in benches:
        row = fn()
        print(json.dumps(row), flush=True)
        rows.append(row)
    if suite:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_SUITE.json"), "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
