"""MNIST inference CLI: render the c1..c7 sweep grids from a trained
generator checkpoint.

Parity: ``python MNIST/generate_image.py`` (MNIST/generate_image.py) —
loads ``generator_40000.pt`` by default (:147) and writes 10x10 grids
into ``test/varying_c*/``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from eadgan_tpu.cli import common  # noqa: F401  (EADGAN_PLATFORM hook)

from eadgan_tpu.models import MnistGenerator
from eadgan_tpu.sample.figures import mnist_inference_grids
from eadgan_tpu.train.checkpoint import restore_model
from eadgan_tpu.train.state import ModelVars


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, default="generator_40000.pt")
    parser.add_argument("--out_dir", type=str, default="test")
    parser.add_argument("--batches_done", type=int, default=0)
    opt = parser.parse_args(argv)
    print(opt)

    model = MnistGenerator()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 62)), jnp.zeros((1, 10)), jnp.zeros((1, 7)),
    )
    mv = restore_model(opt.checkpoint, ModelVars.create(variables))

    @jax.jit
    def fwd(z, label, code):
        # train=False: running-stat BN, matching the reference's
        # generator.eval() before rendering (MNIST/generate_image.py:154)
        return model.apply(mv.as_variables(), z, label, code, train=False)

    def apply_g(z, label, code):
        return np.asarray(fwd(jnp.asarray(z), jnp.asarray(label), jnp.asarray(code)))

    mnist_inference_grids(apply_g, opt.out_dir, opt.batches_done)
    print(f"wrote grids under {opt.out_dir}/varying_c1..7/")


if __name__ == "__main__":
    main()
