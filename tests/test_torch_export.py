"""Round-trip tests for the flax -> torch exporter: export a flax
model's variables to a reference-layout state_dict, load it into the
reference architecture in torch, and the torch eval-mode forward must
match the flax forward.  Plus exact export-import identity for
non-SN layouts.  (Inverse direction of test_torch_import.py.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_torch_import import (  # noqa: E402
    TorchApprox,
    TorchCelebaD,
    TorchCelebaG,
    TorchMnistE,
    TorchMnistG,
    TorchSpritesD,
    TorchSpritesE,
    TorchSpritesG,
    TorchSpritesPxy,
)

from eadgan_tpu.interop import (  # noqa: E402
    export_approximator,
    export_celeba_discriminator,
    export_celeba_generator,
    export_mnist_discriminator,
    export_mnist_encoder,
    export_mnist_generator,
    export_sprites_discriminator,
    export_sprites_encoder,
    export_sprites_encoder_pxy,
    export_sprites_generator,
    import_approximator,
    import_sprites_encoder_pxy,
    import_sprites_generator,
)
from eadgan_tpu.models import (  # noqa: E402
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


def _load(t_model, sd):
    t_model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})
    t_model.eval()
    return t_model


def _bn_train(t_model):
    """BatchNorm in batch-stats mode (flax always normalizes by batch
    stats) while SN layers stay in eval (stored-sigma) mode."""
    for m in t_model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.train()
    return t_model


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def _close(flax_out, torch_out, tol=2e-3):
    np.testing.assert_allclose(
        np.asarray(flax_out), torch_out.detach().numpy(), rtol=tol, atol=tol
    )


def test_export_sprites_pxy(rng):
    model = SpritesEncoderPxy()
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 1)))
    x = rng.uniform(0, 1, (4, 64, 64, 1)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x), train=False)
    t = _load(TorchSpritesPxy(), export_sprites_encoder_pxy(variables))
    _close(out, t(_t(x)))


def test_export_sprites_discriminator(rng):
    model = SpritesDiscriminator()
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 1)))
    x = rng.uniform(0, 1, (4, 64, 64, 1)).astype(np.float32)
    out, _ = model.apply(variables, jnp.asarray(x), train=False, mutable=["batch_stats"])
    t = _load(TorchSpritesD(), export_sprites_discriminator(variables))
    _close(out, t(_t(x)))


def test_export_sprites_generator(rng):
    model = SpritesGenerator()
    variables = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 7)))
    z = rng.normal(size=(4, 7)).astype(np.float32)
    out, _ = model.apply(variables, jnp.asarray(z), mutable=["batch_stats"])
    t = _load(TorchSpritesG(), export_sprites_generator(variables))
    t.train()  # batch-stats BN on both sides
    _close(out, t(torch.from_numpy(z)).permute(0, 2, 3, 1))


def test_export_sprites_encoder(rng):
    model = SpritesEncoder()
    variables = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 64, 64, 1)))
    x = rng.uniform(0, 1, (4, 64, 64, 1)).astype(np.float32)
    (cat, cont), _ = model.apply(
        variables, jnp.asarray(x), train=False, mutable=["batch_stats"]
    )
    t = _load(TorchSpritesE(), export_sprites_encoder(variables))
    t_cat, t_cont = t(_t(x))
    _close(cat, t_cat)
    _close(cont, t_cont)


def test_export_mnist_generator(rng):
    model = MnistGenerator()
    variables = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 62)), jnp.zeros((1, 10)), jnp.zeros((1, 7))
    )
    z = rng.normal(size=(4, 62)).astype(np.float32)
    label = rng.uniform(0, 1, (4, 10)).astype(np.float32)
    code = rng.uniform(-1, 1, (4, 7)).astype(np.float32)
    out, _ = model.apply(
        variables, jnp.asarray(z), jnp.asarray(label), jnp.asarray(code),
        mutable=["batch_stats"],
    )
    t = _load(TorchMnistG(), export_mnist_generator(variables))
    t.train()
    _close(
        out,
        t(torch.from_numpy(z), torch.from_numpy(label), torch.from_numpy(code)).permute(0, 2, 3, 1),
    )


def test_export_mnist_encoder(rng):
    model = MnistEncoder()
    variables = model.init(jax.random.PRNGKey(8), jnp.zeros((1, 32, 32, 1)))
    x = (rng.uniform(0, 1, (4, 32, 32, 1)) * 2 - 1).astype(np.float32)
    (label, code, noise), _ = model.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"]
    )
    t = _bn_train(_load(TorchMnistE(), export_mnist_encoder(variables)))
    t_label, t_code, t_noise = t(_t(x))
    _close(label, t_label)
    _close(code, t_code)
    _close(noise, t_noise)


class TorchMnistD(tnn.Module):
    """Reference MNIST Discriminator (MNIST/EAD-GAN_rpqmnxy.py:101-134)."""

    def __init__(self):
        super().__init__()
        from torch.nn.utils import spectral_norm as SN

        chans = [1, 16, 32, 64, 128]
        self.conv_blocks = tnn.Sequential(
            *[
                layer
                for i in range(4)
                for layer in (SN(tnn.Conv2d(chans[i], chans[i + 1], 3, 2, 1)), tnn.LeakyReLU(0.2))
            ]
        )
        self.adv_layer = tnn.Sequential(SN(tnn.Linear(512, 1)))

    def forward(self, x):
        h = self.conv_blocks(x)
        return self.adv_layer(h.reshape(h.shape[0], -1))


def test_export_mnist_discriminator(rng):
    model = MnistDiscriminator()
    variables = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 32, 32, 1)))
    x = (rng.uniform(0, 1, (4, 32, 32, 1)) * 2 - 1).astype(np.float32)
    out, _ = model.apply(variables, jnp.asarray(x), train=False, mutable=["batch_stats"])
    t = _load(TorchMnistD(), export_mnist_discriminator(variables))
    _close(out, t(_t(x)))


def test_export_approximator(rng):
    model = AffineApproximator()
    variables = model.init(jax.random.PRNGKey(10), jnp.zeros((1, 6)))
    x = rng.normal(size=(4, 6)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x))
    t = _load(TorchApprox(), export_approximator(variables))
    _close(out, t(torch.from_numpy(x)))


def test_export_celeba_generator(rng):
    model = CelebaGenerator()
    variables = model.init(
        jax.random.PRNGKey(11), jnp.zeros((1, 200)), jnp.zeros((1, 10)), jnp.zeros((1, 8))
    )
    z = rng.normal(size=(2, 200)).astype(np.float32)
    label = rng.uniform(0, 1, (2, 10)).astype(np.float32)
    code = rng.uniform(-1, 1, (2, 8)).astype(np.float32)
    out, _ = model.apply(
        variables, jnp.asarray(z), jnp.asarray(label), jnp.asarray(code),
        mutable=["batch_stats"],
    )
    t = _load(TorchCelebaG(), export_celeba_generator(variables))
    t.train()
    _close(
        out,
        t(torch.from_numpy(z), torch.from_numpy(label), torch.from_numpy(code)).permute(0, 2, 3, 1),
    )


def test_export_celeba_discriminator(rng):
    model = CelebaDiscriminator()
    variables = model.init(jax.random.PRNGKey(12), jnp.zeros((1, 64, 64, 3)))
    x = (rng.uniform(0, 1, (2, 64, 64, 3)) * 2 - 1).astype(np.float32)
    (cat, cont, validity), _ = model.apply(
        variables, jnp.asarray(x), train=False, mutable=["batch_stats"]
    )
    t = _load(TorchCelebaD(), export_celeba_discriminator(variables))
    t_cat, t_cont, t_v = t(_t(x))
    _close(cat, t_cat)
    _close(cont, t_cont)
    _close(validity, t_v)


def test_export_mnist_generator_eval_mode(rng):
    """train=False must reproduce torch .eval() (running-stat BN) — the
    semantics the reference inference scripts load exports under."""
    model = MnistGenerator()
    variables = model.init(
        jax.random.PRNGKey(13), jnp.zeros((1, 62)), jnp.zeros((1, 10)), jnp.zeros((1, 7))
    )
    z = rng.normal(size=(4, 62)).astype(np.float32)
    label = rng.uniform(0, 1, (4, 10)).astype(np.float32)
    code = rng.uniform(-1, 1, (4, 7)).astype(np.float32)
    out = model.apply(
        variables, jnp.asarray(z), jnp.asarray(label), jnp.asarray(code), train=False
    )
    t = _load(TorchMnistG(), export_mnist_generator(variables))  # .eval()
    _close(
        out,
        t(torch.from_numpy(z), torch.from_numpy(label), torch.from_numpy(code)).permute(0, 2, 3, 1),
    )


def test_export_import_identity_non_sn(rng):
    """Layout conversions are pure permutations for non-SN layers, so
    export followed by import must reproduce the flax params bit-exact."""
    cases = [
        (SpritesEncoderPxy(), (jnp.zeros((1, 64, 64, 1)),),
         export_sprites_encoder_pxy, import_sprites_encoder_pxy),
        (SpritesGenerator(), (jnp.zeros((1, 7)),),
         export_sprites_generator, import_sprites_generator),
        (AffineApproximator(), (jnp.zeros((1, 6)),),
         export_approximator, import_approximator),
    ]
    for model, dummies, export, import_ in cases:
        variables = model.init(jax.random.PRNGKey(1), *dummies)
        back = import_(export(variables))
        for a, b in zip(
            jax.tree.leaves(variables["params"]), jax.tree.leaves(back["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_end_to_end(tmp_path, rng):
    """Drive the export CLI on a saved framework checkpoint and load the
    result with the reference architecture."""
    from eadgan_tpu.cli.export_torch import main as export_main
    from eadgan_tpu.train.checkpoint import save_model
    from eadgan_tpu.train.state import ModelVars

    model = SpritesEncoderPxy()
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 1)))
    src = str(tmp_path / "encoder_pxy_50000.pt")
    save_model(src, ModelVars.create(variables))
    dst = str(tmp_path / "encoder_pxy_50000.torch.pt")
    export_main(["--kind", "sprites_encoder_pxy", "--input", src, "--output", dst])

    t = TorchSpritesPxy()
    t.load_state_dict(torch.load(dst, weights_only=True))
    t.eval()
    x = rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x), train=False)
    _close(out, t(_t(x)))
