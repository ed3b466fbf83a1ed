"""Device-side representation extraction shared by every metric.

The reference's per-metric copy of the align->encode->concat recipe
(dSprites/score/BetVAE.py:235-252 etc.) becomes one jitted function:
align the image with the frozen pxy encoder (translation-only inverse
warp, ``padding_mode='zeros'`` — all score files use zeros,
dSprites/score/BetVAE.py:182), run the category/continuous encoder on
the aligned image, and return the 5-dim representation
``[argmax cat, cont_0, cont_1, align_code_1, align_code_2]``.

The colored variant colorizes the raw grayscale group images with
uniform(0.5, 1) channel gains (colored_dSprites/score/BetVAE.py:207-224)
and divides the aligned image by the predicted color before encoding
(:262-270); the representation layout is unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eadgan_tpu.ops import warp_affine
from eadgan_tpu.transforms import (
    color_code_to_gain,
    inverse_affine,
    pxy_align_matrix,
    remove_color,
)

__all__ = ["Representer"]


class Representer:
    def __init__(
        self,
        pxy_encoder,
        pxy_vars,
        cat_encoder,
        cat_vars,
        colored: bool = False,
        align_rgb_factor: float = 0.1,
        batch_size: int = 500,
        seed: int = 0,
    ):
        self.colored = colored
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

        @jax.jit
        def represent(img):
            align_code = pxy_encoder.apply(pxy_vars, img, train=False)
            matrix = pxy_align_matrix(align_code[:, :3])
            align_img = warp_affine(
                img, inverse_affine(matrix), padding_mode="zeros"
            )
            if colored:
                gain = color_code_to_gain(align_code[:, 3:], align_rgb_factor)
                align_img = remove_color(align_img, gain)
            (cat, cont), _ = cat_encoder.apply(
                cat_vars, align_img, train=False, mutable=["batch_stats"]
            )
            cat_id = jnp.argmax(cat, axis=-1).astype(jnp.float32)[:, None]
            return jnp.concatenate(
                [cat_id, cont[:, 0:2], align_code[:, 1:3]], axis=-1
            )

        self._represent = represent

    def _prepare(self, imgs: np.ndarray) -> np.ndarray:
        """uint8 (B, 64, 64) -> float NHWC, colorized if colored.
        Already-3-channel input passes through unchanged (pre-colorized
        by a caller replicating the reference's exact color draws)."""
        if imgs.ndim == 4 and imgs.shape[-1] == 3:
            return np.ascontiguousarray(imgs, np.float32)
        x = imgs.astype(np.float32)[..., None]
        if self.colored:
            color = self._rng.uniform(0.5, 1.0, (x.shape[0], 1, 1, 3)).astype(
                np.float32
            )
            x = np.tile(x, (1, 1, 1, 3)) * color
        return x

    def __call__(self, imgs: np.ndarray) -> np.ndarray:
        """(B, 64, 64) uint8/float -> (B, 5) representation."""
        out = []
        for start in range(0, imgs.shape[0], self.batch_size):
            x = self._prepare(imgs[start : start + self.batch_size])
            out.append(np.asarray(self._represent(x)))
        return np.concatenate(out, axis=0)
