"""dSprites stage-2 EAD-GAN trainer CLI.

Parity: ``python dSprites/rp.py`` (dSprites/rp.py:39-509) and, with
``--colored``, ``python colored_dSprites/rp_color.py``.  Loads the
frozen stage-1 encoder (default ``encoder_pxy_50000.pt`` /
``encoder_pxy_color_50000.pt``, dSprites/rp.py:271-273), trains with the
three-phase step, writes original/trans/varying_c* grids every
``2*sample_interval`` and saves ``encoder_%d.pt``/``generator_%d.pt``
every ``500*sample_interval`` (gray) or ``50*sample_interval``
(colored), plus full train states for resume.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from eadgan_tpu.cli.common import add_adam_args, add_run_args, init_multiprocess, exit_if_preempted, jit_generator_apply, maybe_resume, resolve_compute_dtype, run_epochs, setup_preemption
from eadgan_tpu.data import load_dsprites
from eadgan_tpu.models import (
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)
from eadgan_tpu.sample.figures import sprites_training_grids
from eadgan_tpu.train.checkpoint import save_model, save_train_state, save_train_state_sync
from eadgan_tpu.train.config import SpritesGanConfig
from eadgan_tpu.train.gan_dsprites import (
    align_images,
    distort_images,
    init_sprites_gan_state,
    make_sprites_gan_step,
)
from eadgan_tpu.train.pretrain import colorize
from eadgan_tpu.utils import MetricLogger


def build_parser(colored: bool) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_epochs", type=int, default=100, help="number of epochs of training")
    parser.add_argument("--batch_size", type=int, default=128, help="size of the batches")
    add_adam_args(parser, lr=2e-4 if colored else 1e-4)
    parser.add_argument("--latent_dim", type=int, default=200, help="dimensionality of the latent space (unused, reference parity)")
    parser.add_argument("--code_dim", type=int, default=7 if colored else 4, help="latent code")
    parser.add_argument("--n_classes", type=int, default=3, help="number of classes for dataset")
    parser.add_argument("--img_size", type=int, default=64, help="size of each image dimension")
    parser.add_argument("--channels", type=int, default=3 if colored else 1, help="number of image channels")
    parser.add_argument("--sample_interval", type=int, default=1000, help="interval between image sampling")
    parser.add_argument("--encoder_pxy", type=str, default="", help="frozen stage-1 encoder checkpoint (.pt)")
    parser.add_argument("--allow_fresh_pxy", action="store_true", help="run with a randomly-initialized aligner if no checkpoint exists (smoke runs)")
    add_run_args(parser)
    return parser


def main(argv=None, colored: bool = False) -> None:
    opt = build_parser(colored).parse_args(argv)
    # Join a supervised gang (cli.supervise --ranks N) before any jax
    # device use; validates --data_parallel/--zero_opt gang rules.
    init_multiprocess(opt)
    print(opt)

    config = SpritesGanConfig(
        n_epochs=opt.n_epochs,
        batch_size=opt.batch_size,
        lr=opt.lr,
        # colored parity: D follows --lr (colored_dSprites/rp_color.py:275);
        # gray hard-codes 2e-4 (dSprites/rp.py:277)
        d_lr=opt.lr if colored else 2e-4,
        b1=opt.b1,
        b2=opt.b2,
        code_dim=opt.code_dim,
        n_classes=opt.n_classes,
        img_size=opt.img_size,
        channels=opt.channels,
        sample_interval=opt.sample_interval,
        colored=colored,
    )
    data = load_dsprites(opt.data_dir)
    images = data.imgs  # uint8; per-batch native gather+normalize

    channels = 3 if colored else 1
    dtype = resolve_compute_dtype(opt)
    generator = SpritesGenerator(channels=channels, dtype=dtype)
    discriminator = SpritesDiscriminator(channels=channels, dtype=dtype)
    encoder = SpritesEncoder(
        n_classes=config.n_classes, code_dim=config.code_dim,
        channels=channels, dtype=dtype,
    )
    # the frozen aligner stays f32 (tiny, and its codes feed the exact
    # 3x3 affine algebra) — same split bench.py measures
    pxy_encoder = SpritesEncoderPxy(out_dim=6 if colored else 3, channels=channels)

    pxy_default = (
        "encoder_pxy_color_50000.pt" if colored else "encoder_pxy_50000.pt"
    )
    pxy_path = opt.encoder_pxy or os.path.join(opt.ckpt_dir, pxy_default)
    pxy_vars = pxy_encoder.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, config.img_size, config.img_size, channels)),
    )
    if os.path.exists(pxy_path):
        from eadgan_tpu.train.checkpoint import restore_model
        from eadgan_tpu.train.state import ModelVars

        mv = restore_model(pxy_path, ModelVars.create(pxy_vars))
        pxy_vars = {"params": mv.params}
        print(f"loaded frozen aligner from {pxy_path}")
    elif not opt.allow_fresh_pxy:
        raise SystemExit(
            f"missing frozen aligner checkpoint {pxy_path}; train stage 1 first "
            "(python -m eadgan_tpu.cli.pxy) or pass --allow_fresh_pxy"
        )

    state = init_sprites_gan_state(
        generator, discriminator, encoder, pxy_encoder, pxy_vars, config,
        jax.random.PRNGKey(opt.seed),
    )
    state = maybe_resume(state, opt.resume, opt.ckpt_dir, "rp_train_state")
    step = make_sprites_gan_step(generator, discriminator, encoder, pxy_encoder, config, donate=True)
    step_body = make_sprites_gan_step(generator, discriminator, encoder, pxy_encoder, config, jit=False)
    logger = MetricLogger(opt.jsonl or None)
    state_holder = [state]
    apply_g = jit_generator_apply(generator, lambda: state_holder[0].g)

    @jax.jit
    def render_pair(pxy_mv_vars, img, rng):
        """align_img + distorted pair for the original/trans grids."""
        from eadgan_tpu.train.state import ModelVars

        krng, crng = jax.random.split(rng)
        if colored:
            img = colorize(crng, img)
        align = align_images(
            pxy_encoder, ModelVars.create({"params": pxy_mv_vars["params"]}), img, config
        )
        code = jax.random.uniform(
            krng, (img.shape[0], config.code_dim), minval=-1.0, maxval=1.0
        )
        trans = distort_images(align, code, config)
        return align, trans

    save_every = config.sample_interval * (50 if colored else 500)

    def on_batch(batches_done, state, metrics, batch):
        state_holder[0] = state
        if batches_done % (config.sample_interval * 2) == 0:
            # render from the CURRENT state's frozen aligner params: the
            # setup-time ``pxy_vars`` buffers were donated into the step
            # on the first call and are dead afterwards
            align, trans = render_pair(
                {"params": state.pxy.params},
                batch[0][:100],
                jax.random.PRNGKey(batches_done),
            )
            sprites_training_grids(
                lambda z_c: apply_g(z_c),
                align,
                trans,
                opt.out_dir,
                batches_done,
                code_dim=config.code_dim,
            )
        if batches_done % save_every == 0:
            save_model(os.path.join(opt.ckpt_dir, f"encoder_{batches_done}.pt"), state.e)
            save_model(
                os.path.join(opt.ckpt_dir, f"generator_{batches_done}.pt"), state.g
            )
            save_train_state(
                opt.ckpt_dir, "rp_train_state", batches_done, state,
                keep=opt.keep_states,
            )

    # Graceful preemption (utils/preempt.py): SIGTERM -> finish the
    # in-flight window -> final train-state save -> exit 86.
    guard = setup_preemption(opt)

    def on_shutdown(step_now, state):
        # fires on EVERY process (engine stop contract): the _sync
        # variant is collective-safe for ZeRO-sharded moments and holds
        # ranks at a barrier until the coordinator's write completes
        save_train_state_sync(
            opt.ckpt_dir, "rp_train_state", step_now, state,
            keep=opt.keep_states,
        )

    run_epochs(
        n_epochs=config.n_epochs,
        data=images,
        labels=None,
        batch_size=config.batch_size,
        state=state,
        step_fn=step,
        on_batch=on_batch,
        seed=opt.seed,
        max_steps=opt.max_steps,
        logger=logger,
        data_parallel=opt.data_parallel,
        zero_opt=opt.zero_opt,
        profile_dir=opt.profile_dir,
        # full metric set of the dSprites step, in emission order — the
        # explicit list enables the packed (K, M) chained-metric path
        # (one fetch RTT per window instead of six)
        metric_keys=[
            "d_loss", "g_loss", "cat_loss", "cont_loss",
            "affine_loss", "relative_cat_loss",
        ],
        chain=opt.chain,
        chain_periods=(config.sample_interval * 2, save_every),
        step_body=step_body,
        watchdog=opt.watchdog,
        stop_event=guard.requested if guard else None,
        on_shutdown=on_shutdown,
    )
    exit_if_preempted(guard)


if __name__ == "__main__":
    main()
