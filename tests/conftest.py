"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device tests exercise the data-parallel mesh without a real TPU
slice (SURVEY.md section 4).  Environment variables must be set before
jax initializes, hence the assignments at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the TPU plugin and pins
# JAX_PLATFORMS before conftest runs; override through the config API so
# tests always run on the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Pin torch's intra-op thread count: parallel reductions partition by
# thread count, so letting it float with host load makes golden/parity
# comparisons nondeterministic at the last few ulps — enough to trip a
# tight multi-step tolerance when the suite shares the host with other
# work. Any fixed count is deterministic; 4 keeps the torch sides fast.
try:
    import torch  # noqa: E402

    torch.set_num_threads(4)
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _deterministic_torch_seed():
    """Reset torch's GLOBAL RNG before every test.

    Several parity tests draw weights/inputs with unseeded torch calls;
    without this, each test's draws depend on how much torch randomness
    *preceding* tests consumed — the round-2 order-dependent
    test_mnist_encoder_import flake.  Seeding per-test makes every test
    see identical draws under any suite ordering or selection.
    """
    try:
        import torch as _torch

        _torch.manual_seed(0)
    except Exception:
        pass
