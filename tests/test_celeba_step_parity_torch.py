"""CelebA GAN-step loss parity vs torch: the shared-info-head topology —
BCE adversarial losses on the discriminator's validity output, the info
phase reading category/continuous heads of the same network, the info
optimizer updating G *and* D, and the closed-form rpqxy regularizer over
the first five codes.

Two configurations of one scaffold:

* reference learning rates — strict at step 0 (complete loss wiring),
  coarse afterwards (lr=1e-3 on a ~50M-param generator amplifies
  cross-framework float-accumulation chaos);
* rates scaled down 10x — chaos suppressed while phase-ordering or
  optimizer-wiring bugs would still compound, so every loss must stay
  within 3% for THREE full steps, the same bar the dSprites topology
  meets (VERDICT round-1 item 7).
"""

import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from eadgan_tpu.interop import (  # noqa: E402
    import_celeba_discriminator,
    import_celeba_generator,
)
from eadgan_tpu.interop.torch_import import converge_sn_state  # noqa: E402
from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator  # noqa: E402
from eadgan_tpu.train.config import CelebaConfig  # noqa: E402
from eadgan_tpu.train.gan_celeba import (  # noqa: E402
    init_celeba_gan_state,
    make_celeba_gan_step,
)
from eadgan_tpu.train.state import ModelVars  # noqa: E402

from tests.test_torch_import import TorchCelebaD, TorchCelebaG  # noqa: E402

B = 4


# compile-heavy (full GAN-step XLA compiles on CPU): excluded from the
# fast tier — run `pytest -m "not slow"` for a quick signal, the full
# suite remains the merge bar (CLAUDE.md).
pytestmark = pytest.mark.slow


def _rpqxy_matrix(code):
    theta = code[:, 0] * math.pi / 9
    p = code[:, 1] * 0.2 + 1
    q = code[:, 2] * 0.2 + 1
    x = code[:, 3] * 0.1
    y = code[:, 4] * 0.1
    c, s = torch.cos(theta), torch.sin(theta)
    a00, a01, a10, a11 = c * p, -s * q, s * p, c * q
    zero, one = torch.zeros_like(p), torch.ones_like(p)
    r0 = torch.stack([a00, a01, a00 * x + a01 * y], 1)
    r1 = torch.stack([a10, a11, a10 * x + a11 * y], 1)
    r2 = torch.stack([zero, zero, one], 1)
    return torch.stack([r0, r1, r2], 1)


def _rpqxy_regularize(real_code, trans_code):
    rel = _rpqxy_matrix(trans_code[:, :5]) @ torch.inverse(_rpqxy_matrix(real_code[:, :5]))
    t1 = rel[:, 0, 0] * rel[:, 1, 0] - rel[:, 0, 1] * rel[:, 1, 1]
    t2 = rel[:, 0, 0] ** 2 + rel[:, 1, 1] ** 2 - rel[:, 0, 1] ** 2 - rel[:, 1, 0] ** 2
    th = 0.5 * torch.atan(2 * t1 / t2)
    ct, st = torch.cos(th), torch.sin(th)
    p = rel[:, 0, 0] * ct + rel[:, 1, 0] * st
    q = -rel[:, 0, 1] * st + rel[:, 1, 1] * ct
    x = (rel[:, 0, 2] * ct + rel[:, 1, 2] * st) / p
    y = (rel[:, 1, 2] * ct - rel[:, 0, 2] * st) / q
    return torch.stack(
        [th / math.pi * 9, (p - 1) / 0.2, (q - 1) / 0.2, x / 0.1, y / 0.1], 1
    )


def _run_both_stacks(rng, steps, g_lr, d_lr, info_lr):
    """Identical weights + injected draws through our jitted step and the
    reference torch loop (celebA/EAD-GAN_celebA.py:296-401); returns
    per-step loss dicts (ours, theirs)."""
    imgs = rng.uniform(-1, 1, (B, 64, 64, 3)).astype(np.float32)
    draws = [
        (
            rng.normal(0, 1, (B, 200)).astype(np.float32),
            rng.integers(0, 10, B),
            rng.uniform(-1, 1, (B, 8)).astype(np.float32),
        )
        for _ in range(steps)
    ]

    t_g, t_d = TorchCelebaG(), TorchCelebaD()
    t_d.train()
    with torch.no_grad():
        for _ in range(40):
            t_d(torch.rand(2, 3, 64, 64))

    def sd(m):
        return {k: v.numpy().copy() for k, v in m.state_dict().items()}

    g_vars = import_celeba_generator(sd(t_g))
    d_vars = converge_sn_state(
        CelebaDiscriminator(), import_celeba_discriminator(sd(t_d)),
        jnp.zeros((1, 64, 64, 3)),
    )

    config = CelebaConfig(batch_size=B, g_lr=g_lr, d_lr=d_lr, info_lr=info_lr)
    g, d = CelebaGenerator(), CelebaDiscriminator()
    state = init_celeba_gan_state(g, d, config, jax.random.PRNGKey(0))
    state = state.replace(g=ModelVars.create(g_vars), d=ModelVars.create(d_vars))
    step = make_celeba_gan_step(g, d, config)

    ours = []
    st = state
    for z, labels, code in draws:
        fixed = {
            "z": jnp.asarray(z),
            "sampled_labels": jnp.asarray(labels),
            "code": jnp.asarray(code),
        }
        st, m = step(st, jnp.asarray(imgs), fixed)
        ours.append({k: float(v) for k, v in m.items()})

    opt_g = torch.optim.Adam(t_g.parameters(), lr=g_lr, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(t_d.parameters(), lr=d_lr, betas=(0.5, 0.999))
    opt_info = torch.optim.Adam(
        itertools.chain(t_g.parameters(), t_d.parameters()), lr=info_lr,
        betas=(0.5, 0.999),
    )
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()
    ce = torch.nn.CrossEntropyLoss()
    t_img = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))

    t_g.train()
    t_d.train()
    theirs = []
    for z, labels, code in draws:
        z = torch.from_numpy(z)
        code = torch.from_numpy(code)
        onehot = torch.eye(10)[labels]
        gt = torch.from_numpy(labels.astype(np.int64))
        valid = torch.ones(B)
        fake = torch.zeros(B)

        grid = TF.affine_grid(
            _rpqxy_matrix(code[:, :5])[:, 0:2], t_img.size(), align_corners=False
        )
        scaled = TF.grid_sample(t_img, grid, padding_mode="border", align_corners=False)

        gen = t_g(z, onehot, code)
        _, _, v = t_d(gen)
        g_loss = bce(v, valid)
        opt_g.zero_grad()
        g_loss.backward()
        opt_g.step()

        _, _, vr = t_d(scaled)
        _, _, vf = t_d(gen.detach())
        d_loss = (bce(vr, valid) + bce(vf, fake)) / 2
        opt_d.zero_grad()
        d_loss.backward()
        opt_d.step()

        gen = t_g(z, onehot, code)
        pl, pc, _ = t_d(gen)
        info_1 = ce(pl, gt) + mse(pc, code)
        _, tc, _ = t_d(scaled)
        _, rc, _ = t_d(t_img)
        info = info_1 + mse(_rpqxy_regularize(rc, tc), code[:, :5])
        opt_info.zero_grad()
        info.backward()
        opt_info.step()

        theirs.append(
            {"d_loss": float(d_loss), "g_loss": float(g_loss), "info_loss": float(info)}
        )
    return ours, theirs


def _assert_steps_close(ours, theirs, step_rtol, atol):
    for s, (a_, b_) in enumerate(zip(ours, theirs)):
        for k in b_:
            assert np.isfinite(a_[k]) and np.isfinite(b_[k])
            np.testing.assert_allclose(
                a_[k], b_[k], rtol=step_rtol[s], atol=atol,
                err_msg=f"step {s} {k}: ours={a_[k]} torch={b_[k]}",
            )


def test_celeba_step_losses_match_torch(rng):
    ours, theirs = _run_both_stacks(rng, steps=2, g_lr=1e-3, d_lr=2e-4, info_lr=2e-4)
    # Step 0 validates the complete loss wiring tightly; later steps see
    # legitimate cross-framework float-accumulation divergence amplified
    # by CelebA's lr=1e-3 on a ~50M-param generator.
    _assert_steps_close(ours, theirs, [2e-2, 0.15], atol=5e-3)


def test_celeba_step_losses_match_torch_low_lr(rng):
    ours, theirs = _run_both_stacks(rng, steps=3, g_lr=1e-4, d_lr=2e-5, info_lr=2e-5)
    _assert_steps_close(ours, theirs, [3e-2] * 3, atol=1e-3)
