"""CelebA inference CLI: render the c1..c8 sweep grids from a trained
checkpoint.

Parity: ``python celebA/gen_imgs.py`` (celebA/gen_imgs.py) — loads
``checkpoint_600000.tar`` by default (:106) and writes 10x10 grids into
``images/varying_c*/``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from eadgan_tpu.cli import common  # noqa: F401  (EADGAN_PLATFORM hook)

from eadgan_tpu.models import CelebaGenerator
from eadgan_tpu.sample.figures import celeba_inference_grids
from eadgan_tpu.train.checkpoint import restore_pytree


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, default="checkpoint_600000.tar")
    parser.add_argument("--out_dir", type=str, default="images")
    parser.add_argument("--batches_done", type=int, default=0)
    parser.add_argument(
        "--quant",
        choices=["none", "bf16", "int8"],
        default="none",
        help="inference path: none = exact f32 model apply (reference "
        "parity); bf16 = BN-folded bf16 forward; int8 = quantized mid "
        "layers (64 dB PSNR, 4x smaller weights; measured speed-neutral "
        "on v5e — see ops/quant.py)",
    )
    opt = parser.parse_args(argv)
    print(opt)

    model = CelebaGenerator()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 200)), jnp.zeros((1, 10)), jnp.zeros((1, 8)),
    )
    template = {
        "discriminator_state_dict": None,  # tolerated: restored lazily below
        "generator_state_dict": {
            "params": variables["params"],
            "stats": variables.get("batch_stats", {}),
        },
        "epoch": 0,
        "batches_done": 0,
    }
    # restore only the generator subtree (the D subtree's structure is not
    # needed for inference and may differ across versions)
    import flax.serialization as ser

    with open(opt.checkpoint, "rb") as f:
        raw = ser.msgpack_restore(f.read())
    gen_tree = ser.from_state_dict(template["generator_state_dict"],
                                   raw["generator_state_dict"])
    mv_vars = {"params": gen_tree["params"]}
    if gen_tree["stats"]:
        mv_vars["batch_stats"] = gen_tree["stats"]

    if opt.quant != "none":
        from eadgan_tpu.ops.quant import make_celeba_infer

        fwd = make_celeba_infer(
            mv_vars, quant="int8" if opt.quant == "int8" else "none"
        )
    else:

        @jax.jit
        def fwd(z, label, code):
            # train=False: running-stat BN, matching the reference's
            # generator.eval() before rendering (celebA/gen_imgs.py:114)
            return model.apply(mv_vars, z, label, code, train=False)

    def apply_g(z, label, code):
        return np.asarray(fwd(jnp.asarray(z), jnp.asarray(label), jnp.asarray(code)))

    celeba_inference_grids(apply_g, opt.out_dir, opt.batches_done)
    print(f"wrote grids under {opt.out_dir}/varying_c1..8/")


if __name__ == "__main__":
    main()
