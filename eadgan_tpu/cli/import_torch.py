"""Convert reference PyTorch checkpoints to this framework's format.

    python -m eadgan_tpu.cli.import_torch --kind sprites_encoder \
        --input encoder_500000.pt --output encoder_500000.flax.pt

Covers every checkpoint the reference saves (SURVEY.md 2.1 name
contract); ``celeba_checkpoint`` splits a ``checkpoint_%d.tar`` into
generator/discriminator files.  Imported spectral-norm kernels are
pre-normalized and the flax power-iteration state is converged at
import, so outputs match the torch eval-mode forward exactly
(tests/test_torch_import.py).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from eadgan_tpu.cli import common  # noqa: F401  (EADGAN_PLATFORM hook)
from eadgan_tpu.interop import torch_import as ti
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
from eadgan_tpu.train.checkpoint import save_model
from eadgan_tpu.train.state import ModelVars

_KINDS = {
    # kind: (importer, model factory, dummy input factory)
    "approximator": (
        ti.import_approximator,
        lambda o: AffineApproximator(),
        lambda o: (jnp.zeros((1, 6)),),
    ),
    "mnist_generator": (
        ti.import_mnist_generator,
        lambda o: MnistGenerator(),
        lambda o: (jnp.zeros((1, 62)), jnp.zeros((1, 10)), jnp.zeros((1, 7))),
    ),
    "mnist_encoder": (
        ti.import_mnist_encoder,
        lambda o: MnistEncoder(),
        lambda o: (jnp.zeros((1, 32, 32, 1)),),
    ),
    "mnist_discriminator": (
        ti.import_mnist_discriminator,
        lambda o: MnistDiscriminator(),
        lambda o: (jnp.zeros((1, 32, 32, 1)),),
    ),
    "sprites_encoder_pxy": (
        ti.import_sprites_encoder_pxy,
        lambda o: SpritesEncoderPxy(out_dim=6 if o.colored else 3, channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 64, 64, 3 if o.colored else 1)),),
    ),
    "sprites_generator": (
        ti.import_sprites_generator,
        lambda o: SpritesGenerator(channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 10 if o.colored else 7)),),
    ),
    "sprites_discriminator": (
        ti.import_sprites_discriminator,
        lambda o: SpritesDiscriminator(channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 64, 64, 3 if o.colored else 1)),),
    ),
    "sprites_encoder": (
        ti.import_sprites_encoder,
        lambda o: SpritesEncoder(code_dim=7 if o.colored else 4, channels=3 if o.colored else 1),
        lambda o: (jnp.zeros((1, 64, 64, 3 if o.colored else 1)),),
    ),
    "celeba_generator": (
        ti.import_celeba_generator,
        lambda o: CelebaGenerator(),
        lambda o: (jnp.zeros((1, 200)), jnp.zeros((1, 10)), jnp.zeros((1, 8))),
    ),
    "celeba_discriminator": (
        ti.import_celeba_discriminator,
        lambda o: CelebaDiscriminator(),
        lambda o: (jnp.zeros((1, 64, 64, 3)),),
    ),
}


def _convert(kind, sd, opt, out_path):
    importer, model_fn, dummy_fn = _KINDS[kind]
    try:
        variables = importer(sd)
    except KeyError as e:
        raise SystemExit(
            f"state_dict is missing key {e} — is {opt.input!r} really a "
            f"{kind!r} checkpoint? (its keys start with: "
            f"{sorted(sd)[:3]})"
        ) from None
    model = model_fn(opt)
    variables = ti.converge_sn_state(model, variables, *dummy_fn(opt))
    save_model(out_path, ModelVars.create(variables))
    print(f"wrote {out_path}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--kind", required=True, choices=sorted(_KINDS) + ["celeba_checkpoint"]
    )
    parser.add_argument("--input", required=True, help="reference .pt / .tar file")
    parser.add_argument("--output", required=True, help="output .pt (flax msgpack)")
    parser.add_argument("--colored", action="store_true", help="colored-dSprites variants")
    opt = parser.parse_args(argv)
    print(opt)

    if opt.kind == "celeba_checkpoint":
        import torch

        raw = torch.load(opt.input, map_location="cpu", weights_only=True)
        if not isinstance(raw, dict) or "generator_state_dict" not in raw:
            raise SystemExit(
                f"{opt.input!r} is not a reference CelebA checkpoint_%d.tar "
                "(expected a dict with 'generator_state_dict'/"
                "'discriminator_state_dict'); for plain state_dicts use "
                "--kind celeba_generator / celeba_discriminator"
            )

        def to_np(sd):
            return {
                k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()
            }

        _convert("celeba_generator", to_np(raw["generator_state_dict"]), opt,
                 opt.output + ".generator")
        _convert("celeba_discriminator", to_np(raw["discriminator_state_dict"]), opt,
                 opt.output + ".discriminator")
        return

    sd = ti.load_torch_state_dict(opt.input)
    _convert(opt.kind, sd, opt, opt.output)


if __name__ == "__main__":
    main()
