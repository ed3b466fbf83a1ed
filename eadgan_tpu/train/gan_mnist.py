"""MNIST adversarial train step (LSGAN + neural affine regularizer).

Phase order parity with MNIST/EAD-GAN_rpqmnxy.py:337-446: the generator
adversarial update runs first (against the *previous* step's D), then D
trains on warped reals vs the detached pre-update fakes, then the info
phase (categorical CE + 0.1 code MSE + 0.1 neural affine consistency)
updates G and the separate encoder jointly.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from eadgan_tpu.losses import mse_loss, torch_cross_entropy
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.train.config import MnistConfig
from eadgan_tpu.train.state import GanTrainState, ModelVars, adam, apply_model
from eadgan_tpu.transforms import RPQMNXY, code_to_matrix
from eadgan_tpu.transforms.neural import regularize_neural

__all__ = ["init_mnist_gan_state", "make_mnist_gan_step"]


def init_mnist_gan_state(
    generator, discriminator, encoder, approx_variables, config: MnistConfig, rng
) -> GanTrainState:
    """``approx_variables`` is the frozen rpqmnxy approximator (the
    reference loads rpqmnxy_approximator.pt at import,
    MNIST/utils_rpqmnxy.py:36-43)."""
    rng, kg, kd, ke = jax.random.split(rng, 4)
    dummy_img = jnp.zeros((1, config.img_size, config.img_size, config.channels))
    g = ModelVars.create(
        generator.init(
            kg,
            jnp.zeros((1, config.latent_dim)),
            jnp.zeros((1, config.n_classes)),
            jnp.zeros((1, config.code_dim)),
        )
    )
    d = ModelVars.create(discriminator.init(kd, dummy_img))
    e = ModelVars.create(encoder.init(ke, dummy_img))
    approx = ModelVars.create(approx_variables)

    tx_g = adam(config.lr, config.b1, config.b2)
    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.lr, config.b1, config.b2)
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        g=g,
        d=d,
        e=e,
        approx=approx,
        opt_g=tx_g.init(g.params),
        opt_d=tx_d.init(d.params),
        opt_info=tx_info.init({"g": g.params, "e": e.params}),
    )


def make_mnist_gan_step(generator, discriminator, encoder, approximator, config: MnistConfig, donate: bool = False, jit: bool = True):
    tx_g = adam(config.lr, config.b1, config.b2)
    tx_d = adam(config.d_lr, config.b1, config.b2)
    tx_info = adam(config.lr, config.b1, config.b2)

    # donate=True: in-place state update on device (see gan_celeba.py)
    def step(state: GanTrainState, real_imgs: jnp.ndarray, labels: jnp.ndarray, fixed=None):
        """``real_imgs``: (B, 32, 32, 1) normalized to [-1, 1];
        ``labels``: (B,) int class ids (present for CLI parity; the
        training losses only use freshly sampled labels, as in the
        reference where dataset labels feed nothing but to_categorical
        at :348).  ``fixed`` (parity tests only) injects the random
        draws: {"z", "sampled_labels", "code"}."""
        del labels
        batch = real_imgs.shape[0]
        rng, kz, klabel, kcode = jax.random.split(state.rng, 4)

        if fixed is not None:
            z = fixed["z"]
            sampled_labels = fixed["sampled_labels"]
            code = fixed["code"]
        else:
            z = jax.random.normal(kz, (batch, config.latent_dim))
            sampled_labels = jax.random.randint(klabel, (batch,), 0, config.n_classes)
            code = jax.random.uniform(
                kcode, (batch, config.code_dim), minval=-1.0, maxval=1.0
            )
        label_input = jax.nn.one_hot(sampled_labels, config.n_classes)

        # Warped "real" distribution for D (MNIST/EAD-GAN_rpqmnxy.py:365-367)
        matrix = code_to_matrix(RPQMNXY, code)
        scaled_img = warp_affine(real_imgs, matrix, padding_mode="border")

        # --- G phase (uses previous-step D) --------------------------------
        def g_loss_fn(g_params):
            gen, g_stats = apply_model(
                generator, state.g.replace(params=g_params), z, label_input, code
            )
            validity, d_stats = apply_model(discriminator, state.d, gen)
            loss = mse_loss(validity, jnp.ones_like(validity))
            return loss, (gen, g_stats, d_stats)

        (g_loss, (gen_imgs, g_stats, d_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.g.params)
        g_params = optax.apply_updates(state.g.params, g_updates)

        # --- D phase (fakes are the pre-update G's, detached) ---------------
        def d_loss_fn(d_params):
            dv = ModelVars(params=d_params, stats=d_stats)
            real_pred, ds = apply_model(discriminator, dv, scaled_img)
            fake_pred, ds = apply_model(
                discriminator, dv.replace(stats=ds), jax.lax.stop_gradient(gen_imgs)
            )
            loss = (
                mse_loss(real_pred, jnp.ones_like(real_pred))
                + mse_loss(fake_pred, jnp.zeros_like(fake_pred))
            ) / 2.0
            return loss, ds

        (d_loss, d_stats2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d.params
        )
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.d.params)
        d_params = optax.apply_updates(state.d.params, d_updates)

        # --- info phase (updated G, separate encoder) ----------------------
        def info_loss_fn(params):
            gv = ModelVars(params=params["g"], stats=g_stats)
            ev = state.e.replace(params=params["e"])

            gen, g_stats_new = apply_model(generator, gv, z, label_input, code)
            (pred_label, pred_code, _), e_stats = apply_model(encoder, ev, gen)

            info_1 = config.lambda_cat * torch_cross_entropy(
                pred_label, sampled_labels
            ) + config.lambda_con * mse_loss(pred_code, code)

            (t_label, transform_code, _), e_stats = apply_model(
                encoder, ev.replace(stats=e_stats), scaled_img
            )
            (r_label, real_code, _), e_stats = apply_model(
                encoder, ev.replace(stats=e_stats), real_imgs
            )

            pred_affine = regularize_neural(
                approximator,
                state.approx.as_variables(),
                real_code,
                transform_code,
            )
            affine = config.lambda_affine * mse_loss(pred_affine, code)
            total = info_1 + affine
            return total, {
                "g_stats": g_stats_new,
                "e_stats": e_stats,
            }

        info_params = {"g": g_params, "e": state.e.params}
        (info_loss, aux), info_grads = jax.value_and_grad(info_loss_fn, has_aux=True)(
            info_params
        )
        info_updates, opt_info = tx_info.update(info_grads, state.opt_info, info_params)
        new_info = optax.apply_updates(info_params, info_updates)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            g=ModelVars(params=new_info["g"], stats=aux["g_stats"]),
            d=ModelVars(params=d_params, stats=d_stats2),
            e=ModelVars(params=new_info["e"], stats=aux["e_stats"]),
            opt_g=opt_g,
            opt_d=opt_d,
            opt_info=opt_info,
        )
        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "info_loss": info_loss,
        }
        return new_state, metrics

    if not jit:
        return step
    return functools.partial(jax.jit, donate_argnums=0 if donate else ())(step)
