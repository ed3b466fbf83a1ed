"""CelebA EAD-GAN trainer CLI.

Parity: ``python celebA/EAD-GAN_celebA.py`` (celebA/EAD-GAN_celebA.py).
Reads an image folder (Resize/CenterCrop/Flip/Normalize pipeline),
trains the shared-info-head step, writes grids every ``sample_interval``
and saves a combined ``checkpoint_%d.tar`` carrying both models plus
epoch/batches_done (celebA/EAD-GAN_celebA.py:414-423) — here the full
resumable train state rides along in ``celeba_train_state_%d.ckpt``.
"""

from __future__ import annotations

import argparse
import os

import jax

from eadgan_tpu.cli.common import add_adam_args, add_run_args, init_multiprocess, exit_if_preempted, jit_generator_apply, maybe_resume, resolve_compute_dtype, run_epochs, setup_preemption
from eadgan_tpu.data import load_image_folder
from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.sample.figures import celeba_training_grids
from eadgan_tpu.train.checkpoint import save_pytree, save_train_state, save_train_state_sync
from eadgan_tpu.train.config import CelebaConfig
from eadgan_tpu.train.gan_celeba import init_celeba_gan_state, make_celeba_gan_step
from eadgan_tpu.transforms import RPQXY, code_to_matrix
from eadgan_tpu.utils import MetricLogger


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_epochs", type=int, default=50, help="number of epochs of training")
    parser.add_argument("--batch_size", type=int, default=16, help="size of the batches")
    add_adam_args(parser, lr=2e-4)
    parser.add_argument("--latent_dim", type=int, default=200, help="dimensionality of the latent space")
    parser.add_argument("--code_dim", type=int, default=8, help="latent code")
    parser.add_argument("--n_classes", type=int, default=10, help="number of classes for dataset")
    parser.add_argument("--img_size", type=int, default=64, help="size of each image dimension")
    parser.add_argument("--channels", type=int, default=3, help="number of image channels")
    parser.add_argument("--sample_interval", type=int, default=4000, help="interval between image sampling")
    parser.add_argument("--max_images", type=int, default=0, help="cap dataset size (0 = all)")
    add_run_args(parser)
    opt = parser.parse_args(argv)
    # Join a supervised gang (cli.supervise --ranks N) before any jax
    # device use; validates --data_parallel/--zero_opt gang rules.
    init_multiprocess(opt)
    print(opt)

    config = CelebaConfig(
        n_epochs=opt.n_epochs,
        batch_size=opt.batch_size,
        b1=opt.b1,
        b2=opt.b2,
        latent_dim=opt.latent_dim,
        code_dim=opt.code_dim,
        n_classes=opt.n_classes,
        img_size=opt.img_size,
        channels=opt.channels,
        sample_interval=opt.sample_interval,
    )
    # Flips are NOT baked into the archive: they are re-drawn per batch
    # inside run_epochs (random_flip=True below), matching the reference
    # per-fetch RandomHorizontalFlip (celebA/EAD-GAN_celebA.py:199).
    images = load_image_folder(
        os.path.join(opt.data_dir, "data"),
        config.img_size,
        max_images=opt.max_images or None,
        flip=False,
        seed=opt.seed,
    )

    dtype = resolve_compute_dtype(opt)
    generator = CelebaGenerator(
        latent_dim=config.latent_dim, n_classes=config.n_classes,
        code_dim=config.code_dim, channels=config.channels, dtype=dtype,
    )
    discriminator = CelebaDiscriminator(
        n_classes=config.n_classes, code_dim=config.code_dim,
        channels=config.channels, dtype=dtype,
    )
    state = init_celeba_gan_state(
        generator, discriminator, config, jax.random.PRNGKey(opt.seed)
    )
    state = maybe_resume(state, opt.resume, opt.ckpt_dir, "celeba_train_state")
    step = make_celeba_gan_step(generator, discriminator, config, donate=True)
    step_body = make_celeba_gan_step(generator, discriminator, config, jit=False)
    logger = MetricLogger(opt.jsonl or None, print_every=10)
    state_holder = [state]
    apply_g = jit_generator_apply(generator, lambda: state_holder[0].g)

    @jax.jit
    def warp_batch(img, rng):
        code = jax.random.uniform(rng, (img.shape[0], config.code_dim), minval=-1, maxval=1)
        return warp_affine(
            img, code_to_matrix(RPQXY, code[:, :5]), padding_mode="border"
        )

    def on_batch(batches_done, state, metrics, batch):
        state_holder[0] = state
        if batches_done % config.sample_interval == 0:
            real = batch[0][:100]
            scaled = warp_batch(real, jax.random.PRNGKey(batches_done))
            celeba_training_grids(
                apply_g, real, scaled, opt.out_dir, batches_done,
                latent_dim=config.latent_dim, n_classes=config.n_classes,
                code_dim=config.code_dim,
            )
        if batches_done % (config.sample_interval * 15) == 0:
            n_batches = max(images.shape[0] // config.batch_size, 1)
            save_pytree(
                os.path.join(opt.ckpt_dir, f"checkpoint_{batches_done}.tar"),
                {
                    "discriminator_state_dict": {
                        "params": state.d.params, "stats": state.d.stats
                    },
                    "generator_state_dict": {
                        "params": state.g.params, "stats": state.g.stats
                    },
                    "epoch": batches_done // n_batches,
                    "batches_done": batches_done,
                },
            )
            save_train_state(
                opt.ckpt_dir, "celeba_train_state", batches_done, state,
                keep=opt.keep_states,
            )

    # Graceful preemption: SIGTERM finishes the in-flight window, saves
    # a final train state at the exact current step, exits 86
    # (utils/preempt.py; --resume auto continues with zero lost steps).
    guard = setup_preemption(opt)

    def on_shutdown(step_now, state):
        # fires on EVERY process (engine stop contract): the _sync
        # variant is collective-safe for ZeRO-sharded moments and holds
        # ranks at a barrier until the coordinator's write completes
        save_train_state_sync(
            opt.ckpt_dir, "celeba_train_state", step_now, state,
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
        metric_keys=["d_loss", "g_loss"],
        scale=1.0 / 127.5,
        shift=-1.0,
        random_flip=True,
        chain=opt.chain,
        chain_periods=(config.sample_interval, config.sample_interval * 15),
        step_body=step_body,
        watchdog=opt.watchdog,
        stop_event=guard.requested if guard else None,
        on_shutdown=on_shutdown,
    )
    exit_if_preempted(guard)


if __name__ == "__main__":
    main()
