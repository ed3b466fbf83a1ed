"""Affine code algebra: latent code <-> physical parameters <-> 3x3 matrices.

The reference maps uniform latent codes in [-1, 1] to physical affine
parameters with fixed per-family scale factors, composes elementary
transforms into a 3x3 matrix, and recovers the *relative* parameters
between two coded transforms with a closed-form least-squares inverse.

Parameterization families (factors match the reference exactly):

========  =======================  ============================  =============================
family    code layout              factors                       reference
========  =======================  ============================  =============================
pxy       (p, x, y)                pq=0.1, xy=0.1                dSprites/utils_pxy.py:24-46
rp        (theta, p, x, y)         r=9, pq=0.2, xy=0.1           dSprites/utils_rp.py:23-35
rpqxy     (theta, p, q, x, y)      r=9, pq=0.2, xy=0.1           celebA/utils_rpqxy.py:25-55
rpqmnxy   (theta, p, q, m, n,      r=9, pq=0.2, mn=0.2, xy=0.1   MNIST/utils_rpqmnxy.py:46-84
           x, y)
========  =======================  ============================  =============================

Matrix composition order is R(theta) @ Z(p[,q]) @ [S(m,n) @] T(x,y)
(MNIST/utils_rpqmnxy.py:111, dSprites/utils_rp.py:56,
celebA/utils_rpqxy.py:77, dSprites/utils_pxy.py:63).  Here the product
is expanded analytically instead of materializing four (B, 3, 3)
factors per step, so the whole construction is a handful of fused VPU
ops inside the jitted step rather than the reference's CPU-side build +
host->device copy.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "AffineFamily",
    "PXY",
    "RP",
    "RPQXY",
    "RPQMNXY",
    "FAMILIES",
    "code_to_params",
    "params_to_code",
    "build_affine_matrix",
    "code_to_matrix",
    "inverse_affine",
    "compose_relative",
    "regularize_matrix",
    "regularize",
    "pxy_align_matrix",
]


@dataclasses.dataclass(frozen=True)
class AffineFamily:
    """Static description of one affine code parameterization."""

    name: str
    n_affine: int
    has_rotation: bool
    anisotropic: bool
    has_skew: bool
    r_factor: float = 9.0
    pq_factor: float = 0.2
    mn_factor: float = 0.2
    xy_factor: float = 0.1


PXY = AffineFamily(
    name="pxy", n_affine=3, has_rotation=False, anisotropic=False,
    has_skew=False, pq_factor=0.1, xy_factor=0.1,
)
RP = AffineFamily(
    name="rp", n_affine=4, has_rotation=True, anisotropic=False,
    has_skew=False, pq_factor=0.2, xy_factor=0.1,
)
RPQXY = AffineFamily(
    name="rpqxy", n_affine=5, has_rotation=True, anisotropic=True,
    has_skew=False, pq_factor=0.2, xy_factor=0.1,
)
RPQMNXY = AffineFamily(
    name="rpqmnxy", n_affine=7, has_rotation=True, anisotropic=True,
    has_skew=True, pq_factor=0.2, mn_factor=0.2, xy_factor=0.1,
)

FAMILIES = {f.name: f for f in (PXY, RP, RPQXY, RPQMNXY)}


def _split_code(family: AffineFamily, code: jnp.ndarray):
    """Split a (B, n_affine) code into named components, filling defaults."""
    if code.shape[-1] < family.n_affine:
        raise ValueError(
            f"family {family.name!r} expects at least {family.n_affine} code "
            f"columns, got {code.shape[-1]}"
        )
    cols = iter(range(code.shape[-1]))
    zero = jnp.zeros_like(code[..., 0])
    theta_c = code[..., next(cols)] if family.has_rotation else zero
    p_c = code[..., next(cols)]
    q_c = code[..., next(cols)] if family.anisotropic else p_c
    m_c = code[..., next(cols)] if family.has_skew else zero
    n_c = code[..., next(cols)] if family.has_skew else zero
    x_c = code[..., next(cols)]
    y_c = code[..., next(cols)]
    return theta_c, p_c, q_c, m_c, n_c, x_c, y_c


def code_to_params(family: AffineFamily, code: jnp.ndarray) -> jnp.ndarray:
    """Latent code in [-1,1] -> physical affine parameters.

    Mirrors ``from_latent_vector_2_affine_para*``
    (dSprites/utils_rp.py:62-74, MNIST/utils_rpqmnxy.py:46-63,
    celebA/utils_rpqxy.py:25-38, dSprites/utils_pxy.py:24-34):
    theta = c * pi / r_factor, p/q = c * pq_factor + 1,
    m/n = c * mn_factor, x/y = c * xy_factor.
    """
    theta_c, p_c, q_c, m_c, n_c, x_c, y_c = _split_code(family, code)
    out = [
        p_c * family.pq_factor + 1.0,
    ]
    if family.has_rotation:
        out.insert(0, theta_c * (math.pi / family.r_factor))
    if family.anisotropic:
        out.append(q_c * family.pq_factor + 1.0)
    if family.has_skew:
        out.append(m_c * family.mn_factor)
        out.append(n_c * family.mn_factor)
    out.append(x_c * family.xy_factor)
    out.append(y_c * family.xy_factor)
    return jnp.stack(out, axis=-1)


def params_to_code(family: AffineFamily, params: jnp.ndarray) -> jnp.ndarray:
    """Physical affine parameters -> latent code; inverse of
    :func:`code_to_params` (``from_affine_para_2_latent_vector*``,
    dSprites/utils_rp.py:77-90, MNIST/utils_rpqmnxy.py:67-84)."""
    cols = iter(range(params.shape[-1]))
    out = []
    if family.has_rotation:
        out.append(params[..., next(cols)] * (family.r_factor / math.pi))
    out.append((params[..., next(cols)] - 1.0) / family.pq_factor)
    if family.anisotropic:
        out.append((params[..., next(cols)] - 1.0) / family.pq_factor)
    if family.has_skew:
        out.append(params[..., next(cols)] / family.mn_factor)
        out.append(params[..., next(cols)] / family.mn_factor)
    out.append(params[..., next(cols)] / family.xy_factor)
    out.append(params[..., next(cols)] / family.xy_factor)
    return jnp.stack(out, axis=-1)


def build_affine_matrix(
    theta: jnp.ndarray,
    p: jnp.ndarray,
    q: Optional[jnp.ndarray] = None,
    m: Optional[jnp.ndarray] = None,
    n: Optional[jnp.ndarray] = None,
    x: Optional[jnp.ndarray] = None,
    y: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Compose R(theta) @ Z(p, q) @ S(m, n) @ T(x, y) analytically.

    With c = cos(theta), s = sin(theta) the product expands to::

        [[c*p - s*q*n,  c*p*m - s*q,  a00*x + a01*y],
         [s*p + c*q*n,  s*p*m + c*q,  a10*x + a11*y],
         [0,            0,            1            ]]

    which equals the reference's four-matmul chain
    (MNIST/utils_rpqmnxy.py:95-111) without materializing the factors.
    Returns a (B, 3, 3) batch.
    """
    q = p if q is None else q
    zero = jnp.zeros_like(p)
    m = zero if m is None else m
    n = zero if n is None else n
    x = zero if x is None else x
    y = zero if y is None else y

    c = jnp.cos(theta)
    s = jnp.sin(theta)
    a00 = c * p - s * q * n
    a01 = c * p * m - s * q
    a10 = s * p + c * q * n
    a11 = s * p * m + c * q
    tx = a00 * x + a01 * y
    ty = a10 * x + a11 * y

    one = jnp.ones_like(p)
    row0 = jnp.stack([a00, a01, tx], axis=-1)
    row1 = jnp.stack([a10, a11, ty], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _params_to_components(family: AffineFamily, params: jnp.ndarray):
    """Params share the code's column layout with zero default angle
    (theta in radians rather than code units) — reuse the splitter."""
    return _split_code(family, params)


def code_to_matrix(family: AffineFamily, code: jnp.ndarray) -> jnp.ndarray:
    """Latent code -> (B, 3, 3) affine matrix (``get_matrix*`` parity:
    dSprites/utils_rp.py:94-115, celebA/utils_rpqxy.py:59-80,
    dSprites/utils_pxy.py:49-66, MNIST/utils_rpqmnxy.py:87-114)."""
    params = code_to_params(family, code)
    theta, p, q, m, n, x, y = _params_to_components(family, params)
    return build_affine_matrix(theta, p, q, m, n, x, y)


def inverse_affine(matrix: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form inverse of affine matrices with last row [0,0,1].

    Replaces the reference's ``torch.inverse`` on (B, 3, 3)
    (dSprites/utils_rp.py via torch.inverse at dSprites/rp.py:376,453):
    for M = [[A, t], [0, 1]], M^-1 = [[A^-1, -A^-1 t], [0, 1]] with the
    2x2 adjugate inverse — cheaper and exactly what XLA fuses best.
    """
    a00 = matrix[..., 0, 0]
    a01 = matrix[..., 0, 1]
    a10 = matrix[..., 1, 0]
    a11 = matrix[..., 1, 1]
    tx = matrix[..., 0, 2]
    ty = matrix[..., 1, 2]
    det = a00 * a11 - a01 * a10
    # matrices built from *predicted* codes can degenerate to det ~ 0
    # mid-training; keep the inverse finite (see _safe_div)
    inv_det = _safe_div(jnp.ones_like(det), det)
    i00 = a11 * inv_det
    i01 = -a01 * inv_det
    i10 = -a10 * inv_det
    i11 = a00 * inv_det
    itx = -(i00 * tx + i01 * ty)
    ity = -(i10 * tx + i11 * ty)
    zero = jnp.zeros_like(a00)
    one = jnp.ones_like(a00)
    row0 = jnp.stack([i00, i01, itx], axis=-1)
    row1 = jnp.stack([i10, i11, ity], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compose_relative(real_matrix: jnp.ndarray, trans_matrix: jnp.ndarray) -> jnp.ndarray:
    """Relative transform ``trans @ real^-1`` (dSprites/utils_rp.py:126,
    celebA/utils_rpqxy.py:91, MNIST/utils_rpqmnxy.py:126).

    Runs at highest precision: the TPU MXU's default bf16 passes lose
    ~1e-2 here, which the code-unscaling step amplifies 10x — enough to
    corrupt the affine-consistency loss.
    """
    return jnp.matmul(
        trans_matrix, inverse_affine(real_matrix), precision=jax.lax.Precision.HIGHEST
    )


_RECOVERY_EPS = 1e-6


def _safe_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a / b with the denominator nudged away from zero.

    The closed-form recoveries divide by recovered zoom terms that come
    from *predicted* (unbounded) codes during training; a degenerate
    prediction makes the reference NaN the whole run
    (inf/0-by-0 through torch.atan/div).  In the normal regime
    |b| ~ 1 >> eps, so values are bit-identical to the plain division.
    """
    guarded = jnp.where(
        jnp.abs(b) < _RECOVERY_EPS,
        jnp.where(b < 0, -_RECOVERY_EPS, _RECOVERY_EPS),
        b,
    )
    return a / guarded


def _matrix_to_params_pxy(rel: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (p, x, y) recovery (dSprites/utils_pxy.py:117-123)."""
    p = (rel[..., 0, 0] + rel[..., 1, 1]) / 2.0
    x = _safe_div(rel[..., 0, 2], p)
    y = _safe_div(rel[..., 1, 2], p)
    return jnp.stack([p, x, y], axis=-1)


def _matrix_to_params_rp(rel: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (theta, p, x, y) recovery via least squares
    (dSprites/utils_rp.py:129-140)."""
    m00, m01 = rel[..., 0, 0], rel[..., 0, 1]
    m10, m11 = rel[..., 1, 0], rel[..., 1, 1]
    m02, m12 = rel[..., 0, 2], rel[..., 1, 2]
    theta = jnp.arctan(_safe_div(m10 - m01, m00 + m11))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    p = 0.5 * (ct * (m00 + m11) + st * (m10 - m01))
    x = _safe_div(m02 * ct + m12 * st, p)
    y = _safe_div(m12 * ct - m02 * st, p)
    return jnp.stack([theta, p, x, y], axis=-1)


def _matrix_to_params_rpqxy(rel: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (theta, p, q, x, y) recovery for the anisotropic-zoom
    family (celebA/utils_rpqxy.py:94-109)."""
    m00, m01 = rel[..., 0, 0], rel[..., 0, 1]
    m10, m11 = rel[..., 1, 0], rel[..., 1, 1]
    m02, m12 = rel[..., 0, 2], rel[..., 1, 2]
    num = m00 * m10 - m01 * m11
    den = m00**2 + m11**2 - m01**2 - m10**2
    theta = 0.5 * jnp.arctan(_safe_div(2.0 * num, den))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    p = m00 * ct + m10 * st
    q = -m01 * st + m11 * ct
    x = _safe_div(m02 * ct + m12 * st, p)
    y = _safe_div(m12 * ct - m02 * st, q)
    return jnp.stack([theta, p, q, x, y], axis=-1)


_CLOSED_FORM = {
    "pxy": _matrix_to_params_pxy,
    "rp": _matrix_to_params_rp,
    "rpqxy": _matrix_to_params_rpqxy,
}


def regularize_matrix(family: AffineFamily, rel: jnp.ndarray) -> jnp.ndarray:
    """Recover physical parameters from a relative affine matrix."""
    try:
        fn = _CLOSED_FORM[family.name]
    except KeyError:
        raise ValueError(
            f"family {family.name!r} has no closed-form recovery; use the "
            "neural approximator (eadgan_tpu.transforms.neural)"
        ) from None
    return fn(rel)


def regularize(
    family: AffineFamily, real_code: jnp.ndarray, trans_code: jnp.ndarray
) -> jnp.ndarray:
    """Affine-consistency regularizer: recover the *relative* latent code
    between two coded transforms.

    Parity with ``affine_regularzier*`` (dSprites/utils_pxy.py:107-126,
    dSprites/utils_rp.py:117-147, celebA/utils_rpqxy.py:82-116): build
    both matrices, compose ``trans @ real^-1``, recover parameters with
    the family's closed form, and unscale back to latent-code units.
    Only the first ``family.n_affine`` columns of each code are used.
    """
    real_matrix = code_to_matrix(family, real_code[..., : family.n_affine])
    trans_matrix = code_to_matrix(family, trans_code[..., : family.n_affine])
    rel = compose_relative(real_matrix, trans_matrix)
    params = regularize_matrix(family, rel)
    return params_to_code(family, params)


def pxy_align_matrix(code: jnp.ndarray) -> jnp.ndarray:
    """Translation-only alignment matrix from a pxy code.

    The reference deliberately drops the zoom component when aligning
    (``get_matrix_pxy_align``, dSprites/utils_pxy.py:69-87 — the
    zoom @ trans composition is commented out at :83-84), keeping only
    T(x, y) built from the scaled translation parameters.
    """
    params = code_to_params(PXY, code[..., :3])
    zero = jnp.zeros_like(params[..., 0])
    one = jnp.ones_like(zero)
    x = params[..., 1]
    y = params[..., 2]
    row0 = jnp.stack([one, zero, x], axis=-1)
    row1 = jnp.stack([zero, one, y], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
