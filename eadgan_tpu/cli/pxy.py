"""dSprites stage-1 pxy alignment-encoder trainer CLI.

Parity: ``python dSprites/pxy.py`` (dSprites/pxy.py:34-205) — and, with
``--colored``, ``python colored_dSprites/pxy_color.py``
(colored_dSprites/pxy_color.py).  Saves ``encoder_pxy_%d.pt`` every
``sample_interval*50`` batches (gray) or ``encoder_pxy_color_%d.pt``
every ``sample_interval*10`` (colored), writes original/align image
grids every ``sample_interval``.
"""

from __future__ import annotations

import argparse
import os

import jax

from eadgan_tpu.cli.common import add_adam_args, add_run_args, init_multiprocess, exit_if_preempted, maybe_resume, run_epochs, setup_preemption
from eadgan_tpu.data import load_dsprites
from eadgan_tpu.models import SpritesEncoderPxy
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.sample.figures import pxy_grids
from eadgan_tpu.train.checkpoint import save_model, save_train_state, save_train_state_sync
from eadgan_tpu.train.config import PxyConfig
from eadgan_tpu.train.pretrain import colorize, init_pxy_state, make_pxy_step
from eadgan_tpu.train.state import apply_model
from eadgan_tpu.transforms import (
    color_code_to_gain,
    inverse_affine,
    pxy_align_matrix,
    remove_color,
)
from eadgan_tpu.utils import MetricLogger


def build_parser(colored: bool) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_epochs", type=int, default=10, help="number of epochs of training")
    parser.add_argument("--batch_size", type=int, default=128, help="size of the batches")
    add_adam_args(parser, lr=2e-4)
    parser.add_argument("--code_dim", type=int, default=6 if colored else 3, help="latent code")
    parser.add_argument("--img_size", type=int, default=64, help="size of each image dimension")
    parser.add_argument("--sample_interval", type=int, default=1000, help="interval between image sampling")
    add_run_args(parser)
    return parser


def make_sampler(encoder, config: PxyConfig, out_dir: str):
    """Aligned-grid renderer (dSprites/pxy.py:130-148 /
    colored_dSprites/pxy_color.py:127-154)."""

    @jax.jit
    def align(variables, img, color_rng):
        if config.colored:
            img = colorize(color_rng, img)
        code = encoder.apply(variables, img, train=False)
        matrix = pxy_align_matrix(code[:, :3])
        out = warp_affine(img, inverse_affine(matrix), padding_mode="border")
        if config.colored:
            gain = color_code_to_gain(code[:, 3:], config.rgb_factor)
            out = remove_color(out, gain)
        return img, out

    def sample(state, img, batches_done):
        real, aligned = align(
            state.model.as_variables(), img, jax.random.PRNGKey(batches_done)
        )
        pxy_grids(real[:100], aligned[:100], out_dir, batches_done)

    return sample


def main(argv=None, colored: bool = False) -> None:
    opt = build_parser(colored).parse_args(argv)
    # Join a supervised gang (cli.supervise --ranks N) before any jax
    # device use; validates --data_parallel/--zero_opt gang rules.
    init_multiprocess(opt)
    print(opt)

    config = PxyConfig(
        n_epochs=opt.n_epochs,
        batch_size=opt.batch_size,
        lr=opt.lr,
        b1=opt.b1,
        b2=opt.b2,
        code_dim=opt.code_dim,
        img_size=opt.img_size,
        sample_interval=opt.sample_interval,
        colored=colored,
    )
    data = load_dsprites(opt.data_dir)
    images = data.imgs  # uint8; per-batch native gather+normalize

    encoder = SpritesEncoderPxy(
        out_dim=config.code_dim, channels=3 if colored else 1
    )
    state = init_pxy_state(encoder, config, jax.random.PRNGKey(opt.seed))
    stem_state = ("encoder_pxy_color" if colored else "encoder_pxy") + "_train_state"
    state = maybe_resume(state, opt.resume, opt.ckpt_dir, stem_state)
    step = make_pxy_step(encoder, config, donate=True)
    step_body = make_pxy_step(encoder, config, jit=False)
    sampler = make_sampler(encoder, config, opt.out_dir)
    logger = MetricLogger(opt.jsonl or None)

    stem = "encoder_pxy_color" if colored else "encoder_pxy"
    save_every = config.sample_interval * (10 if colored else 50)

    def on_batch(batches_done, state, metrics, batch):
        if batches_done % config.sample_interval == 0:
            sampler(state, batch[0], batches_done)
        if batches_done % save_every == 0:
            save_model(
                os.path.join(opt.ckpt_dir, f"{stem}_{batches_done}.pt"), state.model
            )
            save_train_state(
                opt.ckpt_dir, f"{stem}_train_state", batches_done, state,
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
            opt.ckpt_dir, f"{stem}_train_state", step_now, state,
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
        metric_keys=["affine_loss"],
        chain=opt.chain,
        chain_periods=(config.sample_interval, save_every),
        step_body=step_body,
        watchdog=opt.watchdog,
        stop_event=guard.requested if guard else None,
        on_shutdown=on_shutdown,
    )
    exit_if_preempted(guard)


if __name__ == "__main__":
    main()
