"""MNIST affine-approximator pretrainer CLI.

Parity: ``python MNIST/approximate_rpqmnxy.py`` — 20001 iterations of
batch-128 MSE regression from flattened affine matrices to rpqmnxy
parameters, saving ``rpqmnxy_approximator.pt``
(MNIST/approximate_rpqmnxy.py:111-153).
"""

from __future__ import annotations

import argparse
import os

import jax

from eadgan_tpu.models import AffineApproximator
from eadgan_tpu.train.checkpoint import save_model
from eadgan_tpu.train.config import ApproximatorConfig
from eadgan_tpu.train.pretrain import init_approximator_state, make_approximator_step
from eadgan_tpu.utils import MetricLogger


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=20001)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--ckpt_dir", type=str, default=".")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--jsonl", type=str, default="")
    opt = parser.parse_args(argv)
    print(opt)

    config = ApproximatorConfig(
        iterations=opt.iterations, batch_size=opt.batch_size, lr=opt.lr
    )
    model = AffineApproximator()
    state = init_approximator_state(model, config, jax.random.PRNGKey(opt.seed))
    step = make_approximator_step(model, config, donate=True)
    logger = MetricLogger(opt.jsonl or None, print_every=1000)

    path = os.path.join(opt.ckpt_dir, "rpqmnxy_approximator.pt")
    for iteration in range(config.iterations):
        state, metrics = step(state)
        logger.log(iteration, metrics)
        if iteration % 20000 == 0:
            save_model(path, state.model)
    # always persist the final weights (custom --iterations may never
    # hit the 20000-step cadence after training has progressed)
    save_model(path, state.model)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
