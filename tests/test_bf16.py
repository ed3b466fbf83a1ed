"""bf16 compute-path invariants (CLAUDE.md: params f32, optional bf16
compute, BN stats stay f32).

The bench fast path builds models with ``dtype=jnp.bfloat16`` so convs
and matmuls hit the MXU at half precision.  These tests pin the two
contracts that path must keep:

* every ``batch_stats`` leaf (BN running stats, spectral-norm u/sigma)
  stays float32 — variance estimation at half precision destabilizes
  GAN training;
* the bf16 forward agrees with the f32 forward to bf16 tolerance when
  both start from identical (f32) parameters.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from eadgan_tpu.models import (
    CelebaDiscriminator,
    CelebaGenerator,
    MnistGenerator,
)


def _stats_dtypes(tree):
    return {np.dtype(jnp.asarray(leaf).dtype) for leaf in jax.tree_util.tree_leaves(tree)}


@pytest.mark.slow
def test_celeba_generator_bf16_matches_f32(rng):
    z = rng.normal(0, 1, (4, 200)).astype(np.float32)
    labels = jax.nn.one_hot(jnp.arange(4) % 10, 10)
    code = rng.uniform(-1, 1, (4, 8)).astype(np.float32)

    g32 = CelebaGenerator()
    g16 = CelebaGenerator(dtype=jnp.bfloat16)
    variables = g32.init(jax.random.PRNGKey(0), jnp.asarray(z), labels, jnp.asarray(code))

    # params are f32 regardless of compute dtype
    assert _stats_dtypes(variables["params"]) == {np.dtype("float32")}

    out32, st32 = g32.apply(
        variables, jnp.asarray(z), labels, jnp.asarray(code), mutable=["batch_stats"]
    )
    out16, st16 = g16.apply(
        variables, jnp.asarray(z), labels, jnp.asarray(code), mutable=["batch_stats"]
    )

    # BN running stats stay f32 on the bf16 path
    assert _stats_dtypes(st16["batch_stats"]) == {np.dtype("float32")}
    assert np.all(np.isfinite(np.asarray(out16, np.float32)))
    # tanh-bounded outputs; bf16 has ~2-3 decimal digits
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=0.08
    )
    # running means agree closely (accumulated in f32 on both paths)
    m32 = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(st32["batch_stats"])]
    )
    m16 = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(st16["batch_stats"])]
    )
    np.testing.assert_allclose(m16, m32, atol=0.05)


@pytest.mark.slow
def test_celeba_discriminator_bf16_sn_stats_f32(rng):
    img = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    d32 = CelebaDiscriminator()
    d16 = CelebaDiscriminator(dtype=jnp.bfloat16)
    variables = d32.init(jax.random.PRNGKey(0), jnp.asarray(img))

    (cat32, cont32, v32), _ = d32.apply(variables, jnp.asarray(img), mutable=["batch_stats"])
    (cat16, cont16, v16), st16 = d16.apply(variables, jnp.asarray(img), mutable=["batch_stats"])

    assert _stats_dtypes(st16["batch_stats"]) == {np.dtype("float32")}
    for a, b, tol in ((v16, v32, 0.05), (cat16, cat32, 0.05), (cont16, cont32, 0.25)):
        arr = np.asarray(a, np.float32)
        assert np.all(np.isfinite(arr))
        np.testing.assert_allclose(arr, np.asarray(b), atol=tol)


@pytest.mark.slow
def test_mnist_generator_bf16_finite(rng):
    z = rng.normal(0, 1, (4, 62)).astype(np.float32)
    labels = jax.nn.one_hot(jnp.arange(4) % 10, 10)
    code = rng.uniform(-1, 1, (4, 7)).astype(np.float32)

    g16 = MnistGenerator(dtype=jnp.bfloat16)
    variables = g16.init(jax.random.PRNGKey(0), jnp.asarray(z), labels, jnp.asarray(code))
    out, st = g16.apply(
        variables, jnp.asarray(z), labels, jnp.asarray(code), mutable=["batch_stats"]
    )
    assert _stats_dtypes(st["batch_stats"]) == {np.dtype("float32")}
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
