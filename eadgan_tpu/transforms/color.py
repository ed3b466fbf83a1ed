"""Per-channel multiplicative RGB color transform algebra.

The colored-dSprites pipelines add an RGB gain channel transform on top
of the affine warp: latent color codes map to per-channel gains
``gain = code * rgb_factor + 1`` and the consistency regularizer
recovers the relative code from the element-wise gain ratio.

Factor values differ per stage and must match the reference exactly:
rgb_factor = 0.1 at the pxy-pretrain stage
(colored_dSprites/utils_pxy.py:50) and 0.5 at the GAN stage
(colored_dSprites/utils_rp_color.py:40).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "color_code_to_gain",
    "gain_to_color_code",
    "regularize_color",
    "apply_color",
    "remove_color",
]


def color_code_to_gain(code: jnp.ndarray, rgb_factor: float) -> jnp.ndarray:
    """Latent color code -> per-channel gain
    (``from_latent_vector_2_color_para*``,
    colored_dSprites/utils_rp_color.py:38-47)."""
    return code * rgb_factor + 1.0


def gain_to_color_code(gain: jnp.ndarray, rgb_factor: float) -> jnp.ndarray:
    """Per-channel gain -> latent color code
    (``from_color_para_2_latent_vector*``,
    colored_dSprites/utils_rp_color.py:64-73)."""
    return (gain - 1.0) / rgb_factor


def regularize_color(
    real_code: jnp.ndarray, trans_code: jnp.ndarray, rgb_factor: float
) -> jnp.ndarray:
    """Relative color code via the element-wise gain ratio
    ``trans_gain / real_gain`` (colored_dSprites/utils_rp_color.py:130-135,
    colored_dSprites/utils_pxy.py:167-172)."""
    from eadgan_tpu.transforms.affine import _safe_div

    real_gain = color_code_to_gain(real_code, rgb_factor)
    trans_gain = color_code_to_gain(trans_code, rgb_factor)
    # real_gain comes from *predicted* codes during training and can
    # cross zero; guard the ratio like the affine recoveries do
    return gain_to_color_code(_safe_div(trans_gain, real_gain), rgb_factor)


def apply_color(img: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Multiply an NHWC image batch by per-channel gains (B, C)
    (colored_dSprites/rp_color.py:420-424)."""
    return img * gain[:, None, None, :]


_GAIN_FLOOR = 1e-2


def remove_color(img: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Divide an NHWC image batch by per-channel gains (B, C) — the
    alignment step (colored_dSprites/rp_color.py:390-394).

    Gains come from *predicted* codes during GAN training and can cross
    zero (the reference then feeds exploding/NaN images into D and the
    whole run dies — observed at ~step 650 of a colored soak).  The
    magnitude is floored at 1e-2, inactive in the normal gain regime
    (~[0.4, 1.6]) and bounding the aligned image scale at 100x in the
    degenerate one.
    """
    g = gain[:, None, None, :]
    g = jnp.where(jnp.abs(g) < _GAIN_FLOOR, jnp.where(g < 0, -_GAIN_FLOOR, _GAIN_FLOOR), g)
    return img / g
