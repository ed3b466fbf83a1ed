"""Pallas TPU kernel for the affine bilinear warp.

XLA lowers the 4-tap gather of :mod:`eadgan_tpu.ops.stn` to scalar
gathers (~15 ms for a (128, 64, 64, 3) batch — half a CelebA train
step).  This kernel reformulates the warp as one-hot-matrix
contractions that run on the MXU instead:

    out[k, c] = sum_x ( sum_y Ry[k, y] * img[y, c*W + x] ) * Rx[k, x]

with k the flattened output pixel index of a row block.  ``Ry``/``Rx``
carry both the one-hot tap selection and the bilinear interpolation
weights (two taps each; their rank-1 product reproduces all four
bilinear taps exactly).  The x/channel reduction is itself a matmul
with a constant 0/1 selection matrix, so the whole kernel is two MXU
contractions plus VPU iota/compare/select — no gathers, no in-kernel
reshapes or transposes (Mosaic-friendly), no HBM intermediates.

Layout notes: the image block is pre-arranged outside the kernel to
(H, C*W) channel-major lanes; Rx is concatenated C times along lanes to
match.  All layout shuffles happen outside ``pallas_call`` where XLA
transposes are free-ish.

Gradients: training never differentiates through the warp (images are
data, matrices come from sampled codes or the frozen aligner), but a
correct VJP is provided anyway by replaying the reference jnp
implementation's autodiff in the backward pass.
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
    # img block: (1, H, C*W) channel-major lanes; out block: (1, BI*W, C)
    _, h, cw = img_ref.shape
    w = cw // c
    i0 = pl.program_id(1) * block_i
    f32 = jnp.float32

    kw = block_i * w  # flattened pixels in this row block

    # Flattened output pixel index k -> (row i, col j) without reshapes.
    k = jax.lax.broadcasted_iota(jnp.int32, (kw, 1), 0)
    row = k // w + i0
    col = k - (k // w) * w

    # Pixel-center sampling coordinates, align_corners=False convention.
    x_norm = (2.0 * col.astype(f32) + 1.0) / w - 1.0
    y_norm = (2.0 * row.astype(f32) + 1.0) / h - 1.0

    t = matrix_ref  # (1, 2, 3) block for this batch element
    xs = t[0, 0, 0] * x_norm + t[0, 0, 1] * y_norm + t[0, 0, 2]
    ys = t[0, 1, 0] * x_norm + t[0, 1, 1] * y_norm + t[0, 1, 2]

    x = (xs + 1.0) * (w * 0.5) - 0.5
    y = (ys + 1.0) * (h * 0.5) - 0.5
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0  # (KW, 1)
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (kw, w), 1)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (kw, h), 1)

    if padding_mode == "zeros":
        # out-of-range taps simply never match the iota -> weight 0
        rx = jnp.where(iota_x == x0i, 1.0 - wx, 0.0) + jnp.where(
            iota_x == x0i + 1, wx, 0.0
        )
        ry = jnp.where(iota_y == y0i, 1.0 - wy, 0.0) + jnp.where(
            iota_y == y0i + 1, wy, 0.0
        )
    else:
        # border: coords already clamped; x0+1 may be w exactly when
        # x == w-1 (weight 0) -> clamp the tap index into range.
        x1i = jnp.minimum(x0i + 1, w - 1)
        y1i = jnp.minimum(y0i + 1, h - 1)
        rx = jnp.where(iota_x == x0i, 1.0 - wx, 0.0) + jnp.where(iota_x == x1i, wx, 0.0)
        ry = jnp.where(iota_y == y0i, 1.0 - wy, 0.0) + jnp.where(iota_y == y1i, wy, 0.0)

    # MXU contraction over y: (KW, H) @ (H, C*W) -> (KW, C*W).
    # HIGHEST reproduces the golden torch output to ~1e-5 (2x dot cost);
    # 'fast' uses the default bf16 passes (~6e-3 pixel error, ~2x faster
    # kernel) for throughput-first training.
    dot_precision = (
        jax.lax.Precision.HIGHEST if precision == "highest" else
        jax.lax.Precision.DEFAULT
    )
    img_block = img_ref[0].astype(f32)
    tmp = jnp.dot(
        ry, img_block, precision=dot_precision, preferred_element_type=f32,
    )

    # Broadcast Rx across channels (channel-major lanes: index c*W + x).
    rx_rep = jnp.concatenate([rx] * c, axis=1)  # (KW, C*W)
    prod = tmp * rx_rep

    # Reduce over x per channel with a constant selection matrix:
    # S[c*W + x, c] = 1  ->  out = prod @ S  (second MXU contraction).
    sel_row = jax.lax.broadcasted_iota(jnp.int32, (cw, c), 0) // w
    sel_col = jax.lax.broadcasted_iota(jnp.int32, (cw, c), 1)
    sel = (sel_row == sel_col).astype(f32)
    out = jnp.dot(
        prod, sel, precision=dot_precision, preferred_element_type=f32
    )

    out_ref[0] = out.astype(out_ref.dtype)


def _forward(
    img: jnp.ndarray, matrix: jnp.ndarray, padding_mode: str, precision: str
) -> jnp.ndarray:
    n, h, w, c = img.shape
    theta = (matrix[:, :2, :] if matrix.shape[-2] == 3 else matrix).astype(jnp.float32)
    block_i = 8 if h % 8 == 0 else 1
    # channel-major lane layout (H, C*W), arranged outside the kernel
    img_cm = jnp.transpose(img, (0, 1, 3, 2)).reshape(n, h, c * w)
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
                (1, h, c * w), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_i * w, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), img.dtype),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
    )(theta.reshape(n, 2, 3), img_cm)
    return out.reshape(n, h, w, c)


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
