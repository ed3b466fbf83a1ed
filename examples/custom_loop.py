#!/usr/bin/env python
"""Executable version of the README "Library API" section: build a
dSprites EAD-GAN from the importable pieces and train it two ways —

1. a hand-written loop over the jitted 3-phase step
   (``make_sprites_gan_step``), the minimal composition;
2. the CLIs' own epoch engine (``eadgan_tpu.train.run_epochs``) driving
   the SAME un-jitted step body through the chained ``lax.scan`` engine
   (``chain=K``) — prefetching, in-graph normalization, packed metrics.

Runs anywhere: on a machine without the dSprites archive the synthetic
sprite fallback is generated on the fly, and ``EADGAN_PLATFORM=cpu``
forces CPU. Typical use:

    EADGAN_PLATFORM=cpu python examples/custom_loop.py --steps 4 --chain 2

The reference has no library seam at all — every trainer is a flat
script with models defined inline (SURVEY.md "Shape of the codebase";
e.g. /root/reference/dSprites/rp.py) — so this file doubles as the
parity demonstration that the same workflow is a ~60-line composition
here.
"""

from __future__ import annotations

import argparse
import os

# Must run before any jax-using import when forcing a platform.
if os.environ.get("EADGAN_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["EADGAN_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from eadgan_tpu.data import load_dsprites
from eadgan_tpu.models import (
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)
from eadgan_tpu.train import run_epochs
from eadgan_tpu.train.config import SpritesGanConfig
from eadgan_tpu.train.gan_dsprites import (
    init_sprites_gan_state,
    make_sprites_gan_step,
)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=4, help="steps per engine")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--chain", type=int, default=2, help="scan window size")
    opt = parser.parse_args()

    config = SpritesGanConfig(batch_size=opt.batch_size)
    g, d, e = SpritesGenerator(), SpritesDiscriminator(), SpritesEncoder()
    pxy = SpritesEncoderPxy()
    # A trained frozen aligner would come from cli.pxy / import_torch;
    # random init keeps the example self-contained.
    pxy_vars = pxy.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))

    # uint8 sprites in {0, 1}, synthetic fallback when the npz is absent
    images = load_dsprites(".").imgs
    rows = np.random.default_rng(0).permutation(images.shape[0])

    # --- 1. minimal loop: the jitted step is the whole engine ---------
    state = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
    step = make_sprites_gan_step(g, d, e, pxy, config)
    for i in range(opt.steps):
        batch = images[rows[i * opt.batch_size : (i + 1) * opt.batch_size]]
        batch = batch[..., None].astype(np.float32)  # NHWC, [0, 1]
        state, metrics = step(state, batch)
        print(f"[loop step {i}] " + " ".join(
            f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())
        ))

    # --- 2. the production engine on the same un-jitted body ----------
    state2 = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
    body = make_sprites_gan_step(g, d, e, pxy, config, jit=False)
    seen = []
    state2 = run_epochs(
        n_epochs=1,
        data=images[: opt.steps * opt.batch_size],  # uint8; normalized in-graph
        labels=None,
        batch_size=opt.batch_size,
        state=state2,
        # chain > 1 drives the scan engine from the un-jitted body;
        # chain = 1 is the per-dispatch engine, which needs the jitted
        # step — supply both so every --chain value the flag accepts works
        step_fn=step,
        step_body=body,
        chain=opt.chain,
        max_steps=opt.steps,
        on_batch=lambda s, st, m, b: seen.append((s, float(m["d_loss"]))),
        scale=1.0,
        shift=0.0,
    )
    for s, d_loss in seen:
        print(f"[engine step {s}] d_loss={d_loss:.4f}")

    final_step = int(jax.device_get(state2.step))
    assert final_step == opt.steps, (final_step, opt.steps)
    print(f"ok: both engines ran {opt.steps} steps")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
