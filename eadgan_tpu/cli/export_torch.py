"""Convert this framework's checkpoints to reference PyTorch format.

    python -m eadgan_tpu.cli.export_torch --kind mnist_generator \
        --input generator_40000.pt --output generator_40000.torch.pt

The inverse of :mod:`eadgan_tpu.cli.import_torch`: the output loads
directly into the reference's module definitions, so its own inference
and score scripts (``MNIST/generate_image.py:146-152``,
``celebA/gen_imgs.py:106-114``, ``dSprites/score/BetVAE.py:193-205``)
can consume weights trained on TPU.  ``celeba_checkpoint`` assembles the
combined ``checkpoint_%d.tar`` dict (generator + discriminator +
epoch/batches_done, celebA/EAD-GAN_celebA.py:414-423) from the framework
.tar written by ``cli.celeba``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from eadgan_tpu.cli import common  # noqa: F401  (EADGAN_PLATFORM hook)
from eadgan_tpu.interop import torch_export as te
from eadgan_tpu.models import (
    AffineApproximator,
    CelebaDiscriminator,
    CelebaGenerator,
    MnistDiscriminator,
    MnistEncoder,
    MnistGenerator,
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)
from eadgan_tpu.train.checkpoint import restore_model, restore_pytree
from eadgan_tpu.train.state import ModelVars

_KINDS = {
    # kind: (exporter, model factory, dummy input factory)
    "approximator": (
        te.export_approximator,
        lambda o: AffineApproximator(),
        lambda o: (jnp.zeros((1, 6)),),
    ),
    "mnist_generator": (
        te.export_mnist_generator,
        lambda o: MnistGenerator(),
        lambda o: (jnp.zeros((1, 62)), jnp.zeros((1, 10)), jnp.zeros((1, 7))),
    ),
    "mnist_encoder": (
        te.export_mnist_encoder,
        lambda o: MnistEncoder(),
        lambda o: (jnp.zeros((1, 32, 32, 1)),),
    ),
    "mnist_discriminator": (
        te.export_mnist_discriminator,
        lambda o: MnistDiscriminator(),
        lambda o: (jnp.zeros((1, 32, 32, 1)),),
    ),
    "sprites_encoder_pxy": (
        te.export_sprites_encoder_pxy,
        lambda o: SpritesEncoderPxy(out_dim=6 if o.colored else 3, channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 64, 64, 3 if o.colored else 1)),),
    ),
    "sprites_generator": (
        te.export_sprites_generator,
        lambda o: SpritesGenerator(channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 10 if o.colored else 7)),),
    ),
    "sprites_discriminator": (
        te.export_sprites_discriminator,
        lambda o: SpritesDiscriminator(channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 64, 64, 3 if o.colored else 1)),),
    ),
    "sprites_encoder": (
        te.export_sprites_encoder,
        lambda o: SpritesEncoder(code_dim=7 if o.colored else 4, channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 64, 64, 3 if o.colored else 1)),),
    ),
    "celeba_generator": (
        te.export_celeba_generator,
        lambda o: CelebaGenerator(),
        lambda o: (jnp.zeros((1, 200)), jnp.zeros((1, 10)), jnp.zeros((1, 8))),
    ),
    "celeba_discriminator": (
        te.export_celeba_discriminator,
        lambda o: CelebaDiscriminator(),
        lambda o: (jnp.zeros((1, 64, 64, 3)),),
    ),
}


def _model_variables(kind, path, opt):
    exporter, model_fn, dummy_fn = _KINDS[kind]
    model = model_fn(opt)
    init = model.init(jax.random.PRNGKey(0), *dummy_fn(opt))
    mv = restore_model(path, ModelVars.create(init))
    return exporter({"params": mv.params, "batch_stats": mv.stats})


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--kind", required=True, choices=sorted(_KINDS) + ["celeba_checkpoint"]
    )
    parser.add_argument("--input", required=True, help="framework .pt / .tar file")
    parser.add_argument("--output", required=True, help="reference-format torch file")
    parser.add_argument("--colored", action="store_true", help="colored-dSprites variants")
    opt = parser.parse_args(argv)
    print(opt)

    if opt.kind == "celeba_checkpoint":
        import torch

        g = CelebaGenerator()
        d = CelebaDiscriminator()
        template = {
            "discriminator_state_dict": _split_init(d, jnp.zeros((1, 64, 64, 3))),
            "generator_state_dict": _split_init(
                g, jnp.zeros((1, 200)), jnp.zeros((1, 10)), jnp.zeros((1, 8))
            ),
            "epoch": 0,
            "batches_done": 0,
        }
        tree = restore_pytree(opt.input, template)
        out = {}
        for name, exporter in (
            ("generator", te.export_celeba_generator),
            ("discriminator", te.export_celeba_discriminator),
        ):
            sub = tree[f"{name}_state_dict"]
            sd = exporter({"params": sub["params"], "batch_stats": sub["stats"]})
            out[f"{name}_state_dict"] = {
                k: torch.from_numpy(v.copy()) if hasattr(v, "copy") else v
                for k, v in sd.items()
            }
        out["epoch"] = int(tree["epoch"])
        out["batches_done"] = int(tree["batches_done"])
        torch.save(out, opt.output)
        print(f"wrote {opt.output}")
        return

    try:
        sd = _model_variables(opt.kind, opt.input, opt)
    except KeyError as e:
        raise SystemExit(
            f"checkpoint is missing {e} — is {opt.input!r} really a "
            f"{opt.kind!r} checkpoint?"
        ) from None
    te.save_torch_state_dict(opt.output, sd)
    print(f"wrote {opt.output}")


def _split_init(model, *dummies):
    init = model.init(jax.random.PRNGKey(0), *dummies)
    return {"params": init["params"], "stats": init.get("batch_stats", {})}


if __name__ == "__main__":
    main()
