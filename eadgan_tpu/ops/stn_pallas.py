"""Pallas TPU kernel for the affine bilinear warp.

XLA lowers the 4-tap gather of :mod:`eadgan_tpu.ops.stn` to scalar
gathers (~15 ms for a (128, 64, 64, 3) batch — half a CelebA train
step).  This kernel reformulates the warp as MXU contractions against
bilinear *hat-function* weight matrices:

    weight of source texel t for coordinate x  =  max(0, 1 - |x - t|)

which reproduces both bilinear taps exactly (and zero padding for free:
out-of-range coordinates overlap no texel).  Everything is computed in
TRANSPOSED layout — K = flattened output pixels on the lane (last)
dimension throughout — so every tensor is lane-wide and the tiny
channel dimension (3) only ever appears on sublanes:

    tmp[c*W + x, k] = sum_y img_t[c*W + x, y] * RyT[y, k]     (MXU)
    prod            = tmp * tile(RxT, C)                       (VPU)
    out_t[c, k]     = sum_x prod[c*W + x, k]                   (MXU, via
                      a constant 0/1 channel-selection matrix)

No gathers, no in-kernel reshapes or lane-moving transposes; the
(n, C, H*W) -> NHWC shuffle happens outside ``pallas_call`` where XLA
transposes are cheap.

Gradients: training never differentiates through the warp (images are
data, matrices come from sampled codes or the frozen aligner), but a
correct VJP is provided anyway by replaying the reference jnp
implementation's autodiff in the backward pass.

Parity note: 'highest' precision reproduces the golden torch output to
~1e-5 and is the library default; 'fast' (EADGAN_WARP_PRECISION=fast)
runs the contractions at default bf16 MXU precision (~6e-3 pixel error,
immaterial for training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eadgan_tpu.ops import stn as _stn

__all__ = ["warp_affine_pallas"]


def _kernel(
    matrix_ref, img_ref, out_ref, *, block_i: int, padding_mode: str, c: int,
    precision: str,
):
    # img block: (1, C*W, H) channel-major rows; out block: (1, C, BI*W)
    _, cw, h = img_ref.shape
    w = cw // c
    i0 = pl.program_id(1) * block_i
    f32 = jnp.float32

    kw = block_i * w  # flattened output pixels in this row block

    # Flattened output pixel index k -> (row i, col j), all row vectors.
    k = jax.lax.broadcasted_iota(jnp.int32, (1, kw), 1)
    row = k // w + i0
    col = k - (k // w) * w

    # Pixel-center sampling coordinates, align_corners=False convention.
    x_norm = (2.0 * col.astype(f32) + 1.0) / w - 1.0
    y_norm = (2.0 * row.astype(f32) + 1.0) / h - 1.0

    t = matrix_ref  # (1, 2, 3) block for this batch element
    xs = t[0, 0, 0] * x_norm + t[0, 0, 1] * y_norm + t[0, 0, 2]
    ys = t[0, 1, 0] * x_norm + t[0, 1, 1] * y_norm + t[0, 1, 2]

    x = (xs + 1.0) * (w * 0.5) - 0.5  # (1, KW)
    y = (ys + 1.0) * (h * 0.5) - 0.5
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    # Hat-function tap weights, transposed: RyT[y, k], RxT[x, k].
    # (Mosaic only supports integer iotas; cast after materializing.)
    ty = jax.lax.broadcasted_iota(jnp.int32, (h, kw), 0).astype(f32)
    tx = jax.lax.broadcasted_iota(jnp.int32, (w, kw), 0).astype(f32)
    ry_t = jnp.maximum(0.0, 1.0 - jnp.abs(y - ty))  # (H, KW)
    rx_t = jnp.maximum(0.0, 1.0 - jnp.abs(x - tx))  # (W, KW)

    dot_precision = (
        jax.lax.Precision.HIGHEST if precision == "highest" else
        jax.lax.Precision.DEFAULT
    )

    # MXU contraction over y: (C*W, H) @ (H, KW) -> (C*W, KW).
    img_block = img_ref[0].astype(f32)
    tmp = jnp.dot(
        img_block, ry_t, precision=dot_precision, preferred_element_type=f32,
    )

    # Apply Rx across channels (rows are channel-major: index c*W + x).
    rx_rep = jnp.concatenate([rx_t] * c, axis=0)  # (C*W, KW)
    prod = tmp * rx_rep

    # Reduce over x per channel with a constant selection matrix:
    # S[c, c*W + x] = 1  ->  out_t = S @ prod  (second MXU contraction,
    # M = C sublanes, N = KW lanes: nothing is lane-padded).
    sel_row = jax.lax.broadcasted_iota(jnp.int32, (c, cw), 0)
    sel_col = jax.lax.broadcasted_iota(jnp.int32, (c, cw), 1) // w
    sel = (sel_row == sel_col).astype(f32)
    out = jnp.dot(
        sel, prod, precision=dot_precision, preferred_element_type=f32
    )

    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_pair(
    matrix_ref, img_ref, out_ref, *, block_i: int, padding_mode: str, c: int,
    precision: str,
):
    """Two batch elements per program, stacked block-diagonally.

    A dot with M = C*W = 64..192 and K = H = 64 fills at most half of
    the 128x128 MXU tile in each dimension and costs the same cycles as
    a full tile.  Packing a pair as

        [[imgA, 0], [0, imgB]] (2CW, 2H)  @  [[RyA], [RyB]] (2H, KW)

    makes M and K tile-exact, so two images warp in the cycles one used
    to take — and the per-program grid overhead is halved as well
    (measured: 0.109 -> 0.057 ms for the batch-128 64x64x1 warp).
    """
    _, two_cw, h = img_ref.shape  # img block: (1, 2*C*W, H) — pair rows stacked
    cw = two_cw // 2
    w = cw // c
    i0 = pl.program_id(1) * block_i
    f32 = jnp.float32
    kw = block_i * w

    k = jax.lax.broadcasted_iota(jnp.int32, (1, kw), 1)
    row = k // w + i0
    col = k - (k // w) * w
    x_norm = (2.0 * col.astype(f32) + 1.0) / w - 1.0
    y_norm = (2.0 * row.astype(f32) + 1.0) / h - 1.0

    ty = jax.lax.broadcasted_iota(jnp.int32, (h, kw), 0).astype(f32)
    tx = jax.lax.broadcasted_iota(jnp.int32, (w, kw), 0).astype(f32)

    rys, rxs = [], []
    for e in (0, 1):
        t = matrix_ref[e]  # (2, 3)
        xs = t[0, 0] * x_norm + t[0, 1] * y_norm + t[0, 2]
        ys = t[1, 0] * x_norm + t[1, 1] * y_norm + t[1, 2]
        x = (xs + 1.0) * (w * 0.5) - 0.5
        y = (ys + 1.0) * (h * 0.5) - 0.5
        if padding_mode == "border":
            x = jnp.clip(x, 0.0, w - 1.0)
            y = jnp.clip(y, 0.0, h - 1.0)
        rys.append(jnp.maximum(0.0, 1.0 - jnp.abs(y - ty)))  # (H, KW)
        rxs.append(jnp.maximum(0.0, 1.0 - jnp.abs(x - tx)))  # (W, KW)

    dot_precision = (
        jax.lax.Precision.HIGHEST if precision == "highest" else
        jax.lax.Precision.DEFAULT
    )

    # Block-diagonal image stack (2CW, 2H): pair rows already live in
    # VMEM contiguously; the zero blocks make the single dot compute
    # both elements' y-contractions without cross-talk.
    img_a = img_ref[0, :cw].astype(f32)
    img_b = img_ref[0, cw:].astype(f32)
    zero = jnp.zeros_like(img_a)
    a = jnp.concatenate(
        [jnp.concatenate([img_a, zero], 1), jnp.concatenate([zero, img_b], 1)], 0
    )  # (2CW, 2H)
    ry = jnp.concatenate(rys, 0)  # (2H, KW)
    tmp = jnp.dot(a, ry, precision=dot_precision, preferred_element_type=f32)

    rx_rep = jnp.concatenate([rxs[0]] * c + [rxs[1]] * c, 0)  # (2CW, KW)
    prod = tmp * rx_rep

    # Per-pair-element channel reduction: S[e*C + c, e*CW + c*W + x] = 1.
    sel_row = jax.lax.broadcasted_iota(jnp.int32, (2 * c, two_cw), 0)
    sel_col = jax.lax.broadcasted_iota(jnp.int32, (2 * c, two_cw), 1) // w
    sel = (sel_row == sel_col).astype(f32)
    out = jnp.dot(sel, prod, precision=dot_precision, preferred_element_type=f32)

    out_ref[0] = out.astype(out_ref.dtype)  # (2C, KW)


def _forward(
    img: jnp.ndarray, matrix: jnp.ndarray, padding_mode: str, precision: str
) -> jnp.ndarray:
    n, h, w, c = img.shape
    theta = (matrix[:, :2, :] if matrix.shape[-2] == 3 else matrix).astype(jnp.float32)
    # Largest row block whose VMEM working set (~4 live (2*C*W, KW) f32
    # buffers) stays well under the 16 MB budget: fewer, bigger programs
    # amortize grid overhead and feed the MXU longer contractions.
    # Pair-packing wins only while the single-image dot underfills one
    # 128-wide MXU tile (C*W <= 128, i.e. grayscale at these sizes):
    # measured 0.109 -> 0.093 ms for 128x(64,64,1).  At C*W = 192 the
    # kernel is VPU-bound on hat-weight construction and the pair's
    # zero-block FLOPs make it slightly *slower* — keep those unpaired.
    pair = n % 2 == 0 and c * w <= 128
    m_rows = (2 if pair else 1) * c * w
    block_i = 1
    for cand in (64, 32, 16, 8, 4, 2):
        if h % cand == 0 and 4 * m_rows * (cand * w) * 4 <= 10 * 2**20:
            block_i = cand
            break
    # channel-major row layout (C*W, H), arranged outside the kernel
    img_cm = jnp.transpose(img, (0, 3, 2, 1)).reshape(n, c * w, h)
    if pair:
        # two batch elements per program, block-diagonal MXU packing
        kernel = functools.partial(
            _kernel_pair, block_i=block_i, padding_mode=padding_mode, c=c,
            precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n // 2, h // block_i),
            in_specs=[
                pl.BlockSpec((2, 2, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 2 * c * w, h), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * c, block_i * w), lambda b, i: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n // 2, 2 * c, h * w), img.dtype),
            interpret=jax.default_backend() == "cpu",  # tests run on CPU
        )(theta.reshape(n, 2, 3), img_cm.reshape(n // 2, 2 * c * w, h))
        out = out.reshape(n, c, h * w)
    else:
        kernel = functools.partial(
            _kernel, block_i=block_i, padding_mode=padding_mode, c=c,
            precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n, h // block_i),
            in_specs=[
                pl.BlockSpec((1, 2, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, c * w, h), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, c, block_i * w), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, c, h * w), img.dtype),
            interpret=jax.default_backend() == "cpu",  # tests run on CPU
        )(theta.reshape(n, 2, 3), img_cm)
    return jnp.transpose(out, (0, 2, 1)).reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_affine_pallas(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    padding_mode: str = "border",
    precision: str = "highest",
) -> jnp.ndarray:
    """Drop-in MXU replacement for :func:`eadgan_tpu.ops.warp_affine`."""
    return _forward(img, matrix, padding_mode, precision)


def _fwd(img, matrix, padding_mode, precision):
    return _forward(img, matrix, padding_mode, precision), (img, matrix)


def _bwd(padding_mode, precision, residuals, g):
    img, matrix = residuals
    # Correct-by-construction backward: autodiff of the reference jnp
    # implementation (never on a hot path — see module docstring).
    _, vjp = jax.vjp(
        lambda im, m: _stn.warp_affine(im, m, padding_mode=padding_mode, impl="xla"),
        img,
        matrix,
    )
    return vjp(g)


warp_affine_pallas.defvjp(_fwd, _bwd)
