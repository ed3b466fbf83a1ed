"""Pretraining steps: affine-approximator MLP and pxy alignment encoders.

TPU-native rebuild of the two stage-1 drivers:

* :func:`make_approximator_step` — MNIST/approximate_rpqmnxy.py:119-139.
  Random codes, analytic matrix build, MLP regression of the *physical
  parameters* from the flattened 2x3 matrix (the target is the scaled
  parameter vector, not the raw code — :136).
* :func:`make_pxy_step` — dSprites/pxy.py:156-187 (gray) and
  colored_dSprites/pxy_color.py:162-216 (colored, with on-device
  colorization replacing the host-side numpy colorize loop at :172-181).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from eadgan_tpu.losses import mse_loss
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.train.config import ApproximatorConfig, PxyConfig
from eadgan_tpu.train.state import EncoderTrainState, ModelVars, adam, apply_model
from eadgan_tpu.transforms.neural import flatten_matrix_2x3
from eadgan_tpu.transforms import (
    PXY,
    RPQMNXY,
    apply_color,
    code_to_matrix,
    code_to_params,
    color_code_to_gain,
    regularize,
    regularize_color,
)

__all__ = [
    "make_approximator_step",
    "init_approximator_state",
    "make_pxy_step",
    "init_pxy_state",
]


def init_approximator_state(model, config: ApproximatorConfig, rng) -> EncoderTrainState:
    rng, init_rng = jax.random.split(rng)
    variables = model.init(init_rng, jnp.zeros((1, 6)))
    mv = ModelVars.create(variables)
    tx = adam(config.lr, config.b1, config.b2)
    return EncoderTrainState(
        step=jnp.zeros((), jnp.int32), rng=rng, model=mv, opt=tx.init(mv.params)
    )


def make_approximator_step(model, config: ApproximatorConfig, donate: bool = False, jit: bool = True):
    tx = adam(config.lr, config.b1, config.b2)

    # donate=True: in-place state update on device (see gan_celeba.py)
    def step(state: EncoderTrainState):
        rng, code_rng = jax.random.split(state.rng)
        code = jax.random.uniform(
            code_rng, (config.batch_size, 7), minval=-1.0, maxval=1.0
        )
        target = code_to_params(RPQMNXY, code)
        matrix = code_to_matrix(RPQMNXY, code)
        flat = flatten_matrix_2x3(matrix)

        def loss_fn(params):
            pred, _ = apply_model(model, state.model.replace(params=params), flat)
            return mse_loss(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.model.params)
        updates, opt = tx.update(grads, state.opt, state.model.params)
        params = optax.apply_updates(state.model.params, updates)
        new_state = state.replace(
            step=state.step + 1, rng=rng, model=state.model.replace(params=params), opt=opt
        )
        return new_state, {"affine_loss": loss}

    if not jit:
        return step
    return functools.partial(jax.jit, donate_argnums=0 if donate else ())(step)


def init_pxy_state(encoder, config: PxyConfig, rng) -> EncoderTrainState:
    rng, init_rng = jax.random.split(rng)
    channels = 3 if config.colored else 1
    dummy = jnp.zeros((1, config.img_size, config.img_size, channels))
    variables = encoder.init(init_rng, dummy)
    mv = ModelVars.create(variables)
    tx = adam(config.lr, config.b1, config.b2)
    return EncoderTrainState(
        step=jnp.zeros((), jnp.int32), rng=rng, model=mv, opt=tx.init(mv.params)
    )


def colorize(rng, img: jnp.ndarray) -> jnp.ndarray:
    """Tile a grayscale NHWC batch to RGB and multiply by per-image
    uniform(0.5, 1) channel colors (colored_dSprites/pxy_color.py:168-181),
    computed on device instead of the reference's host-side numpy."""
    color = jax.random.uniform(rng, (img.shape[0], 1, 1, 3), minval=0.5, maxval=1.0)
    return jnp.tile(img, (1, 1, 1, 3)) * color


def make_pxy_step(encoder, config: PxyConfig, donate: bool = False, jit: bool = True):
    """Self-supervised (p, x, y[, r, g, b]) encoder step: warp the real
    image by a sampled code, encode both, recover the relative code in
    closed form, MSE against the sampled code."""
    tx = adam(config.lr, config.b1, config.b2)
    padding = "zeros" if config.colored else "border"  # pxy_color.py:90 vs pxy.py:93

    # donate=True: in-place state update on device (see gan_celeba.py)
    def step(state: EncoderTrainState, img: jnp.ndarray):
        rng, color_rng, code_rng = jax.random.split(state.rng, 3)
        if config.colored:
            img = colorize(color_rng, img)
        code = jax.random.uniform(
            code_rng, (img.shape[0], config.code_dim), minval=-1.0, maxval=1.0
        )

        matrix = code_to_matrix(PXY, code[:, :3])
        trans_img = warp_affine(img, matrix, padding_mode=padding)
        if config.colored:
            gain = color_code_to_gain(code[:, 3:], config.rgb_factor)
            trans_img = apply_color(trans_img, gain)

        def loss_fn(params):
            mv = state.model.replace(params=params)
            real_code, _ = apply_model(encoder, mv, img)
            trans_code, _ = apply_model(encoder, mv, trans_img)
            rec = regularize(PXY, real_code[:, :3], trans_code[:, :3])
            if config.colored:
                rec_color = regularize_color(
                    real_code[:, 3:], trans_code[:, 3:], config.rgb_factor
                )
                rec = jnp.concatenate([rec, rec_color], axis=-1)
            return mse_loss(rec, code)

        loss, grads = jax.value_and_grad(loss_fn)(state.model.params)
        updates, opt = tx.update(grads, state.opt, state.model.params)
        params = optax.apply_updates(state.model.params, updates)
        new_state = state.replace(
            step=state.step + 1, rng=rng, model=state.model.replace(params=params), opt=opt
        )
        return new_state, {"affine_loss": loss}

    if not jit:
        return step
    return functools.partial(jax.jit, donate_argnums=0 if donate else ())(step)
