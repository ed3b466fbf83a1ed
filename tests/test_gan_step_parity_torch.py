"""Full-step GAN loss parity vs torch: the canonical dSprites 3-phase
step (frozen aligner, D phase, joint G+E info phase with the closed-form
affine regularizer) run for several optimization steps in both stacks
from identical weights, images, and sampled codes — all six losses must
track.

Weights flow torch -> flax through the interop importer (so this also
exercises the importer under training, not just inference); randomness
is injected via the step's ``fixed`` argument.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from eadgan_tpu.interop import (  # noqa: E402
    import_sprites_discriminator,
    import_sprites_encoder,
    import_sprites_encoder_pxy,
    import_sprites_generator,
)
from eadgan_tpu.interop.torch_import import converge_sn_state  # noqa: E402
from eadgan_tpu.models import (  # noqa: E402
    SpritesDiscriminator,
    SpritesEncoder,
    SpritesEncoderPxy,
    SpritesGenerator,
)
from eadgan_tpu.train.config import SpritesGanConfig  # noqa: E402
from eadgan_tpu.train.gan_dsprites import (  # noqa: E402
    init_sprites_gan_state,
    make_sprites_gan_step,
)
from eadgan_tpu.train.state import ModelVars  # noqa: E402

from tests.test_torch_import import (  # noqa: E402
    TorchSpritesD,
    TorchSpritesE,
    TorchSpritesG,
    TorchSpritesPxy,
)

B = 8
STEPS = 3


# compile-heavy (full GAN-step XLA compiles on CPU): excluded from the
# fast tier — run `pytest -m "not slow"` for a quick signal, the full
# suite remains the merge bar (CLAUDE.md).
pytestmark = pytest.mark.slow


def _rp_matrix(code):
    theta = code[:, 0] * math.pi / 9
    p = code[:, 1] * 0.2 + 1
    x = code[:, 2] * 0.1
    y = code[:, 3] * 0.1
    c, s = torch.cos(theta), torch.sin(theta)
    a00, a01, a10, a11 = c * p, -s * p, s * p, c * p
    zero, one = torch.zeros_like(p), torch.ones_like(p)
    r0 = torch.stack([a00, a01, a00 * x + a01 * y], 1)
    r1 = torch.stack([a10, a11, a10 * x + a11 * y], 1)
    r2 = torch.stack([zero, zero, one], 1)
    return torch.stack([r0, r1, r2], 1)


def _pxy_align_matrix(code):
    x = code[:, 1] * 0.1
    y = code[:, 2] * 0.1
    zero, one = torch.zeros_like(x), torch.ones_like(x)
    r0 = torch.stack([one, zero, x], 1)
    r1 = torch.stack([zero, one, y], 1)
    r2 = torch.stack([zero, zero, one], 1)
    return torch.stack([r0, r1, r2], 1)


def _warp(img, matrix):
    grid = TF.affine_grid(matrix[:, 0:2], img.size(), align_corners=False)
    return TF.grid_sample(img, grid, padding_mode="border", align_corners=False)


def _rp_regularize(real_code, trans_code):
    rm = _rp_matrix(real_code[:, :4])
    tm = _rp_matrix(trans_code[:, :4])
    rel = tm @ torch.inverse(rm)
    theta = torch.atan((rel[:, 1, 0] - rel[:, 0, 1]) / (rel[:, 0, 0] + rel[:, 1, 1]))
    ct, st = torch.cos(theta), torch.sin(theta)
    p = 0.5 * (ct * (rel[:, 0, 0] + rel[:, 1, 1]) + st * (rel[:, 1, 0] - rel[:, 0, 1]))
    x = (rel[:, 0, 2] * ct + rel[:, 1, 2] * st) / p
    y = (rel[:, 1, 2] * ct - rel[:, 0, 2] * st) / p
    return torch.stack([theta / math.pi * 9, (p - 1) / 0.2, x / 0.1, y / 0.1], 1)


def _mi_loss(c_given_x, c):
    eps = 1e-8
    cond = torch.mean(-torch.sum(torch.log(c_given_x + eps) * c, dim=1))
    ent = torch.mean(-torch.sum(torch.log(c + eps) * c, dim=1))
    return cond + ent


def test_full_gan_step_losses_match_torch(rng):
    # --- shared fixed inputs ---------------------------------------------
    imgs = rng.uniform(0, 1, (B, 64, 64, 1)).astype(np.float32)
    fixed_steps = []
    for _ in range(STEPS):
        code_d = rng.uniform(-1, 1, (B, 4)).astype(np.float32)
        labels_d = rng.integers(0, 3, B)
        code_i = rng.uniform(-1, 1, (B, 4)).astype(np.float32)
        labels_i = rng.integers(0, 3, B)
        fixed_steps.append((code_d, labels_d, code_i, labels_i))

    # --- torch models; weights flow into flax via the importer ------------
    t_g, t_d, t_e, t_pxy = TorchSpritesG(), TorchSpritesD(), TorchSpritesE(), TorchSpritesPxy()
    for m, warm in (
        (t_d, (torch.rand(4, 1, 64, 64),)),
        (t_e, (torch.rand(4, 1, 64, 64),)),
    ):
        m.train()
        with torch.no_grad():
            for _ in range(40):
                m(*warm)

    def sd(m):
        return {k: v.numpy().copy() for k, v in m.state_dict().items()}

    g_vars = import_sprites_generator(sd(t_g))
    d_vars = converge_sn_state(
        SpritesDiscriminator(), import_sprites_discriminator(sd(t_d)),
        jnp.zeros((1, 64, 64, 1)),
    )
    e_vars = converge_sn_state(
        SpritesEncoder(), import_sprites_encoder(sd(t_e)), jnp.zeros((1, 64, 64, 1))
    )
    pxy_vars = import_sprites_encoder_pxy(sd(t_pxy))

    # --- our stack ---------------------------------------------------------
    config = SpritesGanConfig()
    g, d, e, pxy = (
        SpritesGenerator(),
        SpritesDiscriminator(),
        SpritesEncoder(),
        SpritesEncoderPxy(),
    )
    state = init_sprites_gan_state(g, d, e, pxy, pxy_vars, config, jax.random.PRNGKey(0))
    state = state.replace(
        g=ModelVars.create(g_vars),
        d=ModelVars.create(d_vars),
        e=ModelVars.create(e_vars),
    )
    step = make_sprites_gan_step(g, d, e, pxy, config)

    ours = []
    st = state
    for code_d, labels_d, code_i, labels_i in fixed_steps:
        fixed = {
            "code_d": jnp.asarray(code_d),
            "onehot_d": jnp.asarray(np.eye(3, dtype=np.float32)[labels_d]),
            "code_i": jnp.asarray(code_i),
            "onehot_i": jnp.asarray(np.eye(3, dtype=np.float32)[labels_i]),
        }
        st, m = step(st, jnp.asarray(imgs), fixed)
        ours.append({k: float(v) for k, v in m.items()})

    # --- torch reference-semantics loop ------------------------------------
    import itertools

    t_pxy.eval()
    opt_d = torch.optim.Adam(t_d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_info = torch.optim.Adam(
        itertools.chain(t_g.parameters(), t_e.parameters()), lr=1e-4, betas=(0.5, 0.999)
    )
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()
    t_img = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))

    theirs = []
    t_g.train()
    t_d.train()
    t_e.train()
    for code_d, labels_d, code_i, labels_i in fixed_steps:
        code_d = torch.from_numpy(code_d)
        code_i = torch.from_numpy(code_i)
        onehot_d = torch.eye(3)[labels_d]
        onehot_i = torch.eye(3)[labels_i]
        valid = torch.ones(B, 1)
        fake = torch.zeros(B, 1)

        with torch.no_grad():
            align_code = t_pxy(t_img)
        align_img = _warp(t_img, torch.inverse(_pxy_align_matrix(align_code)))

        trans_img = _warp(align_img, _rp_matrix(code_d))
        gen = t_g(torch.cat([onehot_d, code_d], 1))
        d_loss = (bce(t_d(trans_img), valid) + bce(t_d(gen.detach()), fake)) / 2
        opt_d.zero_grad()
        d_loss.backward()
        opt_d.step()

        gen = t_g(torch.cat([onehot_i, code_i], 1))
        rec_cat, rec_cont = t_e(gen)
        g_loss = bce(t_d(gen), valid)
        cat_loss = _mi_loss(rec_cat, onehot_i)
        cont_loss = mse(rec_cont, code_i)
        trans_img_i = _warp(align_img, _rp_matrix(code_i))
        align_cat, align_cont = t_e(align_img)
        trans_cat, trans_cont = t_e(trans_img_i)
        affine_loss = mse(_rp_regularize(align_cont, trans_cont), code_i)
        rel_cat_loss = _mi_loss(trans_cat, align_cat.detach())
        total = cat_loss + cont_loss + affine_loss + g_loss + rel_cat_loss
        opt_info.zero_grad()
        total.backward()
        opt_info.step()

        theirs.append(
            {
                "d_loss": float(d_loss),
                "g_loss": float(g_loss),
                "cat_loss": float(cat_loss),
                "cont_loss": float(cont_loss),
                "affine_loss": float(affine_loss),
                "relative_cat_loss": float(rel_cat_loss),
            }
        )

    for s, (a, b) in enumerate(zip(ours, theirs)):
        for k in b:
            assert np.isfinite(a[k]) and np.isfinite(b[k])
            np.testing.assert_allclose(
                a[k], b[k], rtol=3e-2, atol=3e-3,
                err_msg=f"step {s} loss {k}: ours={a[k]} torch={b[k]}",
            )
