"""CelebA adversarial train step (shared-info-head discriminator).

Phase order parity with celebA/EAD-GAN_celebA.py:296-401: G phase
against the previous D, D phase on warped reals vs detached pre-update
fakes, then the info phase whose optimizer chains G *and* D
(celebA/EAD-GAN_celebA.py:215-217) — the discriminator's shared trunk is
updated twice per step.  The affine regularizer is the closed-form
anisotropic rpqxy recovery over the first five codes (:325, :391-393).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from eadgan_tpu.losses import bce_loss, mse_loss, torch_cross_entropy
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.train.config import CelebaConfig
from eadgan_tpu.train.state import GanTrainState, ModelVars, adam, apply_model
from eadgan_tpu.transforms import RPQXY, code_to_matrix, regularize

__all__ = ["init_celeba_gan_state", "make_celeba_gan_step"]


def init_celeba_gan_state(generator, discriminator, config: CelebaConfig, rng) -> GanTrainState:
    rng, kg, kd = jax.random.split(rng, 3)
    g = ModelVars.create(
        generator.init(
            kg,
            jnp.zeros((1, config.latent_dim)),
            jnp.zeros((1, config.n_classes)),
            jnp.zeros((1, config.code_dim)),
        )
    )
    d = ModelVars.create(
        discriminator.init(
            kd, jnp.zeros((1, config.img_size, config.img_size, config.channels))
        )
    )
    tx_g = adam(config.g_lr, config.b1, config.b2)
    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.info_lr, config.b1, config.b2)
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        g=g,
        d=d,
        opt_g=tx_g.init(g.params),
        opt_d=tx_d.init(d.params),
        opt_info=tx_info.init({"g": g.params, "d": d.params}),
    )


def make_celeba_gan_step(
    generator, discriminator, config: CelebaConfig, donate: bool = False,
    jit: bool = True,
):
    tx_g = adam(config.g_lr, config.b1, config.b2)
    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.info_lr, config.b1, config.b2)

    # ``donate=True`` donates the carried train state so params and
    # Adam moments update in place on device (halves step memory).
    # Opt-in because the caller's pre-step state buffers become
    # invalid: the CLIs enable it; tests that inspect old params
    # keep the copying default.  ``jit=False`` returns the raw body for
    # the chained multi-step engine (train/chain.py) to lax.scan.
    def step(state: GanTrainState, real_imgs: jnp.ndarray, fixed=None):
        """``real_imgs``: (B, 64, 64, 3) normalized to [-1, 1].
        ``fixed`` (parity tests only) injects the random draws:
        {"z", "sampled_labels", "code"}."""
        batch = real_imgs.shape[0]
        rng, kz, kcode, klabel = jax.random.split(state.rng, 4)

        if fixed is not None:
            z = fixed["z"]
            sampled_labels = fixed["sampled_labels"]
            code = fixed["code"]
        else:
            z = jax.random.normal(kz, (batch, config.latent_dim))
            code = jax.random.uniform(
                kcode, (batch, config.code_dim), minval=-1.0, maxval=1.0
            )
            sampled_labels = jax.random.randint(klabel, (batch,), 0, config.n_classes)
        label_input = jax.nn.one_hot(sampled_labels, config.n_classes)

        matrix = code_to_matrix(RPQXY, code[:, :5])
        scaled_img = warp_affine(real_imgs, matrix, padding_mode="border")

        # --- G phase -------------------------------------------------------
        def g_loss_fn(g_params):
            gen, g_stats = apply_model(
                generator, state.g.replace(params=g_params), z, label_input, code
            )
            (_, _, validity), d_stats = apply_model(discriminator, state.d, gen)
            loss = bce_loss(validity, jnp.ones_like(validity))
            return loss, (gen, g_stats, d_stats)

        (g_loss, (gen_imgs, g_stats, d_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)

        # --- D phase -------------------------------------------------------
        def d_loss_fn(d_params):
            dv = ModelVars(params=d_params, stats=d_stats)
            (_, _, real_pred), ds = apply_model(discriminator, dv, scaled_img)
            (_, _, fake_pred), ds = apply_model(
                discriminator, dv.replace(stats=ds), jax.lax.stop_gradient(gen_imgs)
            )
            loss = (
                bce_loss(real_pred, jnp.ones_like(real_pred))
                + bce_loss(fake_pred, jnp.zeros_like(fake_pred))
            ) / 2.0
            return loss, ds

        (d_loss, d_stats2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d.params
        )
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.d.params)
        d_params = optax.apply_updates(state.d.params, d_updates)

        # --- info phase (updates G and D's shared trunk) --------------------
        def info_loss_fn(params):
            gv = ModelVars(params=params["g"], stats=g_stats)
            dv = ModelVars(params=params["d"], stats=d_stats2)

            gen, g_stats_new = apply_model(generator, gv, z, label_input, code)
            (pred_label, pred_code, _), ds = apply_model(discriminator, dv, gen)

            info_1 = config.lambda_cat * torch_cross_entropy(
                pred_label, sampled_labels
            ) + config.lambda_con * mse_loss(pred_code, code)

            (_, transform_code, _), ds = apply_model(
                discriminator, dv.replace(stats=ds), scaled_img
            )
            (_, real_code, _), ds = apply_model(
                discriminator, dv.replace(stats=ds), real_imgs
            )

            pred_affine = regularize(RPQXY, real_code[:, :5], transform_code[:, :5])
            affine = config.lambda_affine * mse_loss(pred_affine, code[:, :5])
            total = info_1 + affine
            return total, {"g_stats": g_stats_new, "d_stats": ds}

        info_params = {"g": g_params, "d": d_params}
        (info_loss, aux), info_grads = jax.value_and_grad(info_loss_fn, has_aux=True)(
            info_params
        )
        info_updates, opt_info = tx_info.update(info_grads, state.opt_info, info_params)
        new_info = optax.apply_updates(info_params, info_updates)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            g=ModelVars(params=new_info["g"], stats=aux["g_stats"]),
            d=ModelVars(params=new_info["d"], stats=aux["d_stats"]),
            opt_g=opt_g,
            opt_d=opt_d,
            opt_info=opt_info,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss, "info_loss": info_loss}

    if not jit:
        return step
    return functools.partial(jax.jit, donate_argnums=0 if donate else ())(step)
