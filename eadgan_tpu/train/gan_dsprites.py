"""dSprites / colored-dSprites adversarial train step.

One jitted function reproduces the reference's per-batch phases
(dSprites/rp.py:362-509, colored_dSprites/rp_color.py:362-516):

A. align reals with the frozen pxy encoder (translation-only inverse
   warp; colored additionally divides out the predicted color gains);
B. D phase — distort aligned reals with a sampled code, train D on
   distorted-real vs generated (BCE);
C. info phase — one backward through G and E jointly: categorical
   mutual-info + code MSE on generated images, G's adversarial term
   against the *updated* D (phase order parity: rp.py trains D before
   the G adversarial update), the closed-form affine(+color)
   consistency loss on encoded aligned/distorted reals, and the
   relative-category consistency term.

Spectral-norm power iterations and BatchNorm batch stats are threaded
through every apply in the same order torch's forward hooks fire.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from eadgan_tpu.losses import bce_loss, mse_loss, mutual_info_loss
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.train.config import SpritesGanConfig
from eadgan_tpu.train.pretrain import colorize
from eadgan_tpu.train.state import GanTrainState, ModelVars, adam, apply_model
from eadgan_tpu.transforms import (
    PXY,
    RP,
    apply_color,
    code_to_matrix,
    color_code_to_gain,
    inverse_affine,
    pxy_align_matrix,
    regularize,
    regularize_color,
    remove_color,
)

__all__ = [
    "init_sprites_gan_state",
    "make_sprites_gan_step",
    "align_images",
    "distort_images",
]


def init_sprites_gan_state(
    generator, discriminator, encoder, pxy_encoder, pxy_vars, config: SpritesGanConfig, rng
) -> GanTrainState:
    """Build the full state; ``pxy_vars`` are the frozen stage-1 encoder
    variables (the reference loads encoder_pxy_50000.pt, dSprites/rp.py:271-273)."""
    rng, kg, kd, ke = jax.random.split(rng, 4)
    channels = 3 if config.colored else 1
    dummy_img = jnp.zeros((1, config.img_size, config.img_size, channels))
    dummy_zc = jnp.zeros((1, config.n_classes + config.code_dim))

    g = ModelVars.create(generator.init(kg, dummy_zc))
    d = ModelVars.create(discriminator.init(kd, dummy_img))
    e = ModelVars.create(encoder.init(ke, dummy_img))
    pxy = ModelVars.create(pxy_vars)

    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.lr, config.b1, config.b2)
    # No separate G optimizer: the reference's optimizer_G exists but is
    # never stepped in this pipeline (dSprites/rp.py:276 vs the loop) —
    # G's adversarial update lives inside opt_info.
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        g=g,
        d=d,
        e=e,
        pxy=pxy,
        opt_g=None,
        opt_d=tx_d.init(d.params),
        opt_info=tx_info.init({"g": g.params, "e": e.params}),
    )


def align_images(pxy_encoder, pxy: ModelVars, img: jnp.ndarray, config: SpritesGanConfig):
    """Frozen-encoder alignment (dSprites/rp.py:374-377; colored adds the
    color division, colored_dSprites/rp_color.py:384-394)."""
    align_code, _ = apply_model(pxy_encoder, pxy, img, train=False)
    align_matrix = pxy_align_matrix(align_code[:, :3])
    align_img = warp_affine(img, inverse_affine(align_matrix), padding_mode="border")
    if config.colored:
        gain = color_code_to_gain(align_code[:, 3:], config.align_rgb_factor)
        align_img = remove_color(align_img, gain)
    return align_img


def distort_images(align_img, code, config: SpritesGanConfig):
    """Distort aligned reals by a sampled code (affine + optional color),
    dSprites/rp.py:399-400 / colored_dSprites/rp_color.py:416-424."""
    matrix = code_to_matrix(RP, code[:, :4])
    out = warp_affine(align_img, matrix, padding_mode="border")
    if config.colored:
        gain = color_code_to_gain(code[:, 4:], config.rgb_factor)
        out = apply_color(out, gain)
    return out


def make_sprites_gan_step(
    generator, discriminator, encoder, pxy_encoder, config: SpritesGanConfig,
    donate: bool = False, jit: bool = True,
):
    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.lr, config.b1, config.b2)

    def sample_inputs(rng, batch):
        code_rng, label_rng = jax.random.split(rng)
        code = jax.random.uniform(
            code_rng, (batch, config.code_dim), minval=-1.0, maxval=1.0
        )
        labels = jax.random.randint(label_rng, (batch,), 0, config.n_classes)
        onehot = jax.nn.one_hot(labels, config.n_classes)
        return code, onehot

    # donate=True: in-place state update on device (see gan_celeba.py);
    # jit=False returns the raw body for the chained engine (train/chain.py)
    def step(state: GanTrainState, img: jnp.ndarray, fixed=None):
        """``fixed`` (tests/parity runs only) injects the per-phase random
        draws instead of sampling from the state PRNG:
        {"code_d", "onehot_d", "code_i", "onehot_i"}."""
        batch = img.shape[0]
        rng, color_rng, rng_d, rng_info = jax.random.split(state.rng, 4)
        if config.colored:
            img = colorize(color_rng, img)

        # --- A. alignment (frozen encoder) --------------------------------
        align_img = align_images(pxy_encoder, state.pxy, img, config)

        # --- B. D phase ----------------------------------------------------
        if fixed is not None:
            code_d, onehot_d = fixed["code_d"], fixed["onehot_d"]
        else:
            code_d, onehot_d = sample_inputs(rng_d, batch)
        trans_img = distort_images(align_img, code_d, config)
        z_c = jnp.concatenate([onehot_d, code_d], axis=-1)
        gen_imgs, g_stats = apply_model(generator, state.g, z_c)

        def d_loss_fn(d_params):
            dv = state.d.replace(params=d_params)
            d_real, d_stats = apply_model(discriminator, dv, trans_img)
            d_fake, d_stats = apply_model(
                discriminator, dv.replace(stats=d_stats), jax.lax.stop_gradient(gen_imgs)
            )
            valid = jnp.ones_like(d_real)
            fake = jnp.zeros_like(d_fake)
            loss = (bce_loss(d_real, valid) + bce_loss(d_fake, fake)) / 2.0
            return loss, d_stats

        (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d.params
        )
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.d.params)
        d_params = optax.apply_updates(state.d.params, d_updates)
        d_new = ModelVars(params=d_params, stats=d_stats)

        # --- C. info phase (one backward through G and E) ------------------
        if fixed is not None:
            code_i, onehot_i = fixed["code_i"], fixed["onehot_i"]
        else:
            code_i, onehot_i = sample_inputs(rng_info, batch)
        z_c_i = jnp.concatenate([onehot_i, code_i], axis=-1)
        trans_img_i = distort_images(align_img, code_i, config)

        def info_loss_fn(params):
            gv = ModelVars(params=params["g"], stats=g_stats)
            ev = state.e.replace(params=params["e"])

            gen, g_stats_new = apply_model(generator, gv, z_c_i)
            rec_cat, e_stats = apply_model(encoder, ev, gen)
            rec_cat, rec_cont = rec_cat  # encoder returns (cat, cont)

            g_fake, d_stats_new = apply_model(discriminator, d_new, gen)
            g_loss = bce_loss(g_fake, jnp.ones_like(g_fake))

            cat_loss = mutual_info_loss(rec_cat, onehot_i)
            cont_loss = mse_loss(rec_cont, code_i)

            (align_cat, align_cont), e_stats = apply_model(
                encoder, ev.replace(stats=e_stats), align_img
            )
            (trans_cat, trans_cont), e_stats = apply_model(
                encoder, ev.replace(stats=e_stats), trans_img_i
            )

            rec = regularize(RP, align_cont[:, :4], trans_cont[:, :4])
            if config.colored:
                rec_color = regularize_color(
                    align_cont[:, 4:], trans_cont[:, 4:], config.rgb_factor
                )
                rec = jnp.concatenate([rec, rec_color], axis=-1)
            affine_loss = mse_loss(rec, code_i)

            relative_cat_loss = mutual_info_loss(
                trans_cat, jax.lax.stop_gradient(align_cat)
            )

            total = cat_loss + cont_loss + affine_loss + g_loss + relative_cat_loss
            aux = {
                "g_stats": g_stats_new,
                "e_stats": e_stats,
                "d_stats": d_stats_new,
                "metrics": {
                    "d_loss": d_loss,
                    "g_loss": g_loss,
                    "cat_loss": cat_loss,
                    "cont_loss": cont_loss,
                    "affine_loss": affine_loss,
                    "relative_cat_loss": relative_cat_loss,
                },
            }
            return total, aux

        info_params = {"g": state.g.params, "e": state.e.params}
        (_, aux), info_grads = jax.value_and_grad(info_loss_fn, has_aux=True)(
            info_params
        )
        info_updates, opt_info = tx_info.update(info_grads, state.opt_info, info_params)
        new_info_params = optax.apply_updates(info_params, info_updates)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            g=ModelVars(params=new_info_params["g"], stats=aux["g_stats"]),
            d=d_new.replace(stats=aux["d_stats"]),
            e=ModelVars(params=new_info_params["e"], stats=aux["e_stats"]),
            opt_d=opt_d,
            opt_info=opt_info,
        )
        return new_state, aux["metrics"]

    if not jit:
        return step
    return functools.partial(jax.jit, donate_argnums=0 if donate else ())(step)
