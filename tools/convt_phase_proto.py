#!/usr/bin/env python
"""Prototype: k4/s2/p1 transposed conv as a k2/s1 conv producing 4x
channels + depth-to-space interleave (phase decomposition).

Rationale: the G tower's final ConvT(128 -> 3) puts 3 channels on the
lane dimension at 64x64 — 3/128 lane utilization on the MXU.  The phase
form computes (B, H, W, 4*F) at the INPUT resolution (4x fewer padded
rows) and interleaves phases with a reshape, which XLA fuses.

This script validates numerics against flax nn.ConvTranspose (exact
equality up to float assoc) on CPU, then microbenches both on whatever
backend is live.

Derivation (torch ConvT semantics: out[o] += in[t] * W[m], o = s*t + m - p):
  s=2, k=4, p=1 -> m = o - 2t + 1.
  even o=2u:  t=u   -> m=1;  t=u-1 -> m=3
  odd  o=2u+1: t=u   -> m=2;  t=u+1 -> m=0
  => phase dy in {0,1} is a k=2 conv over windows [u-1+dy, u+dy] with
     taps m_y = (3-dy) - 2*j for in-window offset j in {0,1}.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def phase_kernel(kernel4: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, I, O) ConvTranspose kernel -> (2, 2, I, 4*O) phase-conv
    kernel, output channel blocks ordered (dy, dx, f)."""
    blocks = []
    for dy in range(2):
        for dx in range(2):
            # flax lax.conv_transpose applies the kernel FLIPPED relative
            # to the raw scatter derivation (delta-probed: o = 2t+2-m),
            # so the in-window tap index is m_y = 2j + dy, m_x = 2i + dx
            tap = kernel4[2 * jnp.arange(2)[:, None, None, None] + dy,
                          2 * jnp.arange(2)[None, :, None, None] + dx,
                          jnp.arange(kernel4.shape[2])[None, None, :, None],
                          jnp.arange(kernel4.shape[3])[None, None, None, :]]
            blocks.append(tap)
    return jnp.concatenate(blocks, axis=-1)  # (2, 2, I, 4*O)


def phase_convt(x: jnp.ndarray, kernel4: jnp.ndarray, bias: jnp.ndarray,
                dtype=None) -> jnp.ndarray:
    """k4/s2/p1 ConvTranspose via phase decomposition.  x: (B, H, W, I)."""
    b, h, w, i = x.shape
    f = kernel4.shape[-1]
    k2 = phase_kernel(kernel4)
    if dtype is not None:
        x = x.astype(dtype)
        k2 = k2.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4F)
    # phase (dy, dx) reads positions [dy : dy+H, dx : dx+W]
    y = jnp.stack(
        [
            y[:, dy : dy + h, dx : dx + w, (dy * 2 + dx) * f : (dy * 2 + dx + 1) * f]
            for dy in range(2)
            for dx in range(2)
        ],
        axis=3,
    )  # (B, H, W, 4, F) with phase index (dy*2+dx)
    y = y.reshape(b, h, w, 2, 2, f)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, f)
    return y + bias


def validate() -> None:
    from flax import linen as nn

    from eadgan_tpu.models.layers import TorchConvTranspose

    rng = np.random.default_rng(0)
    for (b, h, w, i, f) in [(2, 8, 8, 5, 7), (3, 4, 4, 16, 3), (2, 32, 32, 12, 3)]:
        x = jnp.asarray(rng.normal(size=(b, h, w, i)).astype(np.float32))
        mod = TorchConvTranspose(features=f, kernel_size=4, strides=2, padding=1)
        variables = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(variables, x)
        kernel4 = variables["params"]["ConvTranspose_0"]["kernel"]
        bias = variables["params"]["ConvTranspose_0"]["bias"]
        got = phase_convt(x, kernel4, bias)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"shape {(b,h,w,i)}->{f}: max |diff| = {err:.2e}")
        assert err < 1e-4, "phase decomposition mismatch"
    print("numerics OK")


def bench() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eadgan_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from perf_breakdown import timed

    from eadgan_tpu.models.layers import TorchConvTranspose

    B = 128
    cases = [
        ("last_128_3_at_32", (B, 32, 32, 128), 3),
        ("mid_256_128_at_16", (B, 16, 16, 256), 128),
        ("mid_1024_512_at_4", (B, 4, 4, 1024), 512),
    ]
    for name, shape, f in cases:
        x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
        mod = TorchConvTranspose(features=f, dtype=jnp.bfloat16)
        variables = mod.init(jax.random.PRNGKey(0), x)
        kernel4 = variables["params"]["ConvTranspose_0"]["kernel"]
        bias = variables["params"]["ConvTranspose_0"]["bias"]

        def direct(acc, x):
            return mod.apply(variables, x + acc.astype(x.dtype))

        def phased(acc, x):
            return phase_convt(x + acc.astype(x.dtype), kernel4, bias,
                               dtype=jnp.bfloat16)

        gflop = 2 * shape[0] * shape[1] * shape[2] * 4 * shape[3] * f * 4 / 1e9
        dt_d = timed(direct, x, steps=500)
        dt_p = timed(phased, x, steps=500)
        print(
            f"{name}: direct {dt_d*1e3:.4f} ms ({gflop/dt_d/1e3:.1f} TF/s)  "
            f"phase {dt_p*1e3:.4f} ms ({gflop/dt_p/1e3:.1f} TF/s)  "
            f"speedup x{dt_d/dt_p:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    if "--bench" in sys.argv:
        bench()
    else:
        validate()
