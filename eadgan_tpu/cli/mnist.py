"""MNIST EAD-GAN trainer CLI.

Parity: ``python MNIST/EAD-GAN_rpqmnxy.py`` (MNIST/EAD-GAN_rpqmnxy.py).
Loads the frozen ``rpqmnxy_approximator.pt`` (as
MNIST/utils_rpqmnxy.py:36-43 does at import), trains the LSGAN step,
writes static/original/scaled/varying_c* grids every
``sample_interval`` and saves ``generator_%d.pt``/``encoder_%d.pt``
every ``10*sample_interval`` batches.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from eadgan_tpu.cli.common import add_adam_args, add_run_args, init_multiprocess, exit_if_preempted, jit_generator_apply, maybe_resume, resolve_compute_dtype, run_epochs, setup_preemption
from eadgan_tpu.data import load_mnist
from eadgan_tpu.models import (
    AffineApproximator,
    MnistDiscriminator,
    MnistEncoder,
    MnistGenerator,
)
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.sample.figures import mnist_training_grids
from eadgan_tpu.train.checkpoint import restore_model, save_model, save_train_state, save_train_state_sync
from eadgan_tpu.train.config import MnistConfig
from eadgan_tpu.train.gan_mnist import init_mnist_gan_state, make_mnist_gan_step
from eadgan_tpu.train.state import ModelVars
from eadgan_tpu.transforms import RPQMNXY, code_to_matrix
from eadgan_tpu.utils import MetricLogger


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_epochs", type=int, default=200, help="number of epochs of training")
    parser.add_argument("--batch_size", type=int, default=128, help="size of the batches")
    add_adam_args(parser, lr=1e-4)
    parser.add_argument("--latent_dim", type=int, default=62, help="dimensionality of the latent space")
    parser.add_argument("--code_dim", type=int, default=7, help="latent code")
    parser.add_argument("--n_classes", type=int, default=10, help="number of classes for dataset")
    parser.add_argument("--img_size", type=int, default=32, help="size of each image dimension")
    parser.add_argument("--channels", type=int, default=1, help="number of image channels")
    parser.add_argument("--sample_interval", type=int, default=4000, help="interval between image sampling")
    parser.add_argument("--approximator", type=str, default="", help="frozen rpqmnxy approximator checkpoint")
    parser.add_argument("--allow_fresh_approximator", action="store_true")
    add_run_args(parser)
    opt = parser.parse_args(argv)
    # Join a supervised gang (cli.supervise --ranks N) before any jax
    # device use; validates --data_parallel/--zero_opt gang rules.
    init_multiprocess(opt)
    print(opt)

    config = MnistConfig(
        n_epochs=opt.n_epochs,
        batch_size=opt.batch_size,
        lr=opt.lr,
        b1=opt.b1,
        b2=opt.b2,
        latent_dim=opt.latent_dim,
        code_dim=opt.code_dim,
        n_classes=opt.n_classes,
        img_size=opt.img_size,
        channels=opt.channels,
        sample_interval=opt.sample_interval,
    )
    # download-on-missing like the reference's datasets.MNIST(download=True)
    # (MNIST/EAD-GAN_rpqmnxy.py:234-246); degrades to synthetic on no egress
    images, labels = load_mnist(
        os.path.join(opt.data_dir, "data/mnist"),
        config.img_size,
        download=not opt.no_download,
    )

    dtype = resolve_compute_dtype(opt)
    generator = MnistGenerator(
        latent_dim=config.latent_dim, n_classes=config.n_classes,
        code_dim=config.code_dim, img_size=config.img_size,
        channels=config.channels, dtype=dtype,
    )
    discriminator = MnistDiscriminator(
        img_size=config.img_size, channels=config.channels, dtype=dtype
    )
    encoder = MnistEncoder(
        latent_dim=config.latent_dim, n_classes=config.n_classes,
        code_dim=config.code_dim, img_size=config.img_size,
        channels=config.channels, dtype=dtype,
    )
    # frozen neural regularizer stays f32 (tiny MLP; same split as bench.py)
    approximator = AffineApproximator()

    approx_path = opt.approximator or os.path.join(opt.ckpt_dir, "rpqmnxy_approximator.pt")
    approx_vars = approximator.init(jax.random.PRNGKey(1), jnp.zeros((1, 6)))
    if os.path.exists(approx_path):
        mv = restore_model(approx_path, ModelVars.create(approx_vars))
        approx_vars = {"params": mv.params}
        print(f"loaded frozen approximator from {approx_path}")
    elif not opt.allow_fresh_approximator:
        raise SystemExit(
            f"missing {approx_path}; run python -m eadgan_tpu.cli.approximate_rpqmnxy "
            "first or pass --allow_fresh_approximator"
        )

    state = init_mnist_gan_state(
        generator, discriminator, encoder, approx_vars, config, jax.random.PRNGKey(opt.seed)
    )
    state = maybe_resume(state, opt.resume, opt.ckpt_dir, "mnist_train_state")
    step = make_mnist_gan_step(generator, discriminator, encoder, approximator, config, donate=True)
    step_body = make_mnist_gan_step(generator, discriminator, encoder, approximator, config, jit=False)
    logger = MetricLogger(opt.jsonl or None)
    state_holder = [state]
    apply_g = jit_generator_apply(generator, lambda: state_holder[0].g)

    @jax.jit
    def warp_batch(img, rng):
        code = jax.random.uniform(rng, (img.shape[0], config.code_dim), minval=-1, maxval=1)
        return warp_affine(img, code_to_matrix(RPQMNXY, code), padding_mode="border")

    def on_batch(batches_done, state, metrics, batch):
        state_holder[0] = state
        if batches_done % config.sample_interval == 0:
            real = batch[0][:100]
            scaled = warp_batch(real, jax.random.PRNGKey(batches_done))
            mnist_training_grids(
                apply_g, real, scaled, opt.out_dir, batches_done,
                latent_dim=config.latent_dim, n_classes=config.n_classes,
                code_dim=config.code_dim,
            )
        if batches_done % (config.sample_interval * 10) == 0:
            save_model(os.path.join(opt.ckpt_dir, f"generator_{batches_done}.pt"), state.g)
            save_model(os.path.join(opt.ckpt_dir, f"encoder_{batches_done}.pt"), state.e)
            save_train_state(
                opt.ckpt_dir, "mnist_train_state", batches_done, state,
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
            opt.ckpt_dir, "mnist_train_state", step_now, state,
            keep=opt.keep_states,
        )

    run_epochs(
        n_epochs=config.n_epochs,
        data=images,
        labels=labels,
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
        # full metric set of the MNIST step — enables the packed
        # chained-metric path (train/chain.py)
        metric_keys=["d_loss", "g_loss", "info_loss"],
        chain=opt.chain,
        chain_periods=(config.sample_interval, config.sample_interval * 10),
        step_body=step_body,
        watchdog=opt.watchdog,
        stop_event=guard.requested if guard else None,
        on_shutdown=on_shutdown,
    )
    exit_if_preempted(guard)


if __name__ == "__main__":
    main()
