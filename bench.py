"""Benchmark harness: CelebA 64x64 full train-step throughput per chip.

Runs the complete three-phase CelebA training step (G phase + D phase +
info phase, the reference's heaviest pipeline) on synthetic data on the
available accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

``vs_baseline`` compares against the measured reference-PyTorch
throughput on this host (BASELINE_MEASURED.json, produced by
tools/bench_torch_reference.py — CPU torch is all this container has;
the reference publishes no numbers of its own, see BASELINE.md).
"""

import json
import os
import time

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))

# Production fast path: bf16 MXU passes in the warp kernel (~6e-3 pixel
# error — immaterial for training; the exact 'highest' mode stays the
# library default for parity work).
os.environ.setdefault("EADGAN_WARP_PRECISION", "fast")


def main() -> None:
    import jax

    # Persistent compile cache: the full-train-step compile through the
    # remote-compile tunnel costs minutes; cache it across runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
    from eadgan_tpu.train.config import CelebaConfig
    from eadgan_tpu.train.gan_celeba import init_celeba_gan_state, make_celeba_gan_step

    import jax.numpy as _jnp

    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    compute_dtype = None if dtype_name == "float32" else getattr(_jnp, dtype_name)

    config = CelebaConfig(batch_size=BATCH)
    generator = CelebaGenerator(dtype=compute_dtype)
    discriminator = CelebaDiscriminator(dtype=compute_dtype)
    state = init_celeba_gan_state(
        generator, discriminator, config, jax.random.PRNGKey(0)
    )
    step = make_celeba_gan_step(generator, discriminator, config)

    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, 64, 64, 3), minval=-1.0, maxval=1.0
    )

    # Measure by chaining N steps inside ONE device program
    # (lax.fori_loop) and differencing two lengths: the device cannot
    # return the final loss before executing every iteration, and the
    # dispatch round-trip cancels out.  (Per-call timing through the
    # remote-execution tunnel both adds ~35 ms latency per step and,
    # with plain async dispatch, can report buffers ready before the
    # chain has executed.)
    import jax.numpy as jnp

    @jax.jit
    def run_n(state, imgs, n):
        def body(i, carry):
            s, _ = carry
            s, m = step(s, imgs)
            return (s, m["d_loss"])

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    for _ in range(WARMUP):
        _, loss = run_n(state, imgs, 1)
        float(loss)  # force full execution

    t0 = time.perf_counter()
    _, loss = run_n(state, imgs, 1)
    float(loss)
    t1 = time.perf_counter()
    _, loss = run_n(state, imgs, 1 + STEPS)
    float(loss)
    t2 = time.perf_counter()
    dt = (t2 - t1) - (t1 - t0)

    ips = STEPS * BATCH / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("celeba_train_images_per_sec")
        if ref:
            vs = ips / ref

    print(
        json.dumps(
            {
                "metric": "celeba_train_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
