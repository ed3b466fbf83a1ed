"""Int8 inference-quantization contracts (ops/quant.py).

The oracle is the production eval-mode generator forward
(CelebaGenerator.apply(train=False), the path celebA/gen_imgs.py:114
parity rides on): BN folding must be exact against it, and the int8
path must stay within a PSNR bar of it on non-trivially-scaled weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eadgan_tpu.models import CelebaGenerator
from eadgan_tpu.ops.quant import (
    fold_celeba_generator_bn,
    make_celeba_infer,
    quantize_kernel_per_channel,
)


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = CelebaGenerator()
    variables = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 200)),
        jnp.zeros((1, 10)),
        jnp.zeros((1, 8)),
    )
    # Perturb BN params/stats away from identity so folding is actually
    # exercised (fresh init has mean 0 / var 1 / scale 1 / bias 0, which
    # would make a broken fold invisible).
    variables = jax.device_get(variables)
    rng = np.random.RandomState(7)

    def perturb(path, x):
        name = "/".join(str(k) for k in path)
        x = np.asarray(x)
        if "var" in name:
            return x * rng.uniform(0.5, 2.0, x.shape).astype(x.dtype)
        if "mean" in name or "bias" in name or "scale" in name:
            return x + rng.normal(0, 0.3, x.shape).astype(x.dtype)
        return x

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    return gen, variables


@pytest.fixture(scope="module")
def latents():
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 200))
    lab = jax.nn.one_hot(jnp.arange(8) % 10, 10)
    code = jax.random.uniform(jax.random.PRNGKey(2), (8, 8), minval=-1, maxval=1)
    return z, lab, code


def test_bn_fold_exact(gen_and_vars, latents):
    """quant='none' in f32 must reproduce the eval-mode model forward:
    folding BN into the conv is algebraically lossless."""
    gen, variables = gen_and_vars
    z, lab, code = latents
    ref = gen.apply(variables, z, lab, code, train=False)
    fwd = make_celeba_infer(variables, quant="none", compute_dtype=jnp.float32)
    out = fwd(z, lab, code)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=0)


def test_kernel_quant_round_trip():
    k = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 64, 32)) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(4), (32,))
    )
    q, scale = quantize_kernel_per_channel(k)
    assert q.dtype == jnp.int8 and scale.shape == (32,)
    # round-to-nearest: dequantized error bounded by half a step per channel
    err = jnp.abs(q.astype(jnp.float32) * scale - k)
    assert float(jnp.max(err / scale)) <= 0.5 + 1e-5
    # per-channel: every channel actually uses the int8 range
    assert int(jnp.min(jnp.max(jnp.abs(q), axis=(0, 1, 2)))) == 127


@pytest.mark.slow
def test_int8_psnr_vs_f32(gen_and_vars, latents):
    """int8 mid layers must track the f32 eval forward closely on the
    tanh output scale ([-1, 1])."""
    gen, variables = gen_and_vars
    z, lab, code = latents
    ref = np.asarray(gen.apply(variables, z, lab, code, train=False))
    out = np.asarray(make_celeba_infer(variables, quant="int8")(z, lab, code))
    assert out.shape == ref.shape
    mse = float(np.mean((out - ref) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # peak-to-peak 2 on tanh outputs
    assert psnr > 25.0, f"int8 PSNR {psnr:.1f} dB below bar"
    assert float(np.max(np.abs(out - ref))) < 0.5


def test_quant_mode_validation(gen_and_vars):
    _, variables = gen_and_vars
    with pytest.raises(ValueError):
        make_celeba_infer(variables, quant="int4")
