"""Multi-step training-dynamics parity vs torch.

Runs five full optimization steps of the pxy objective (encoder fwd x2,
STN warp, closed-form regularizer, MSE, backprop, Adam) in both stacks
from identical weights, data, and sampled codes — the loss trajectories
must coincide.  This covers what the single-forward parity test cannot:
conv/STN backward passes and the Adam update rule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from eadgan_tpu.losses import mse_loss
from eadgan_tpu.models import SpritesEncoderPxy
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.train.state import adam
from eadgan_tpu.transforms import PXY, code_to_matrix, regularize

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from tests.test_parity_torch import _torch_pxy_matrix, build_torch_encoder  # noqa: E402


def _torch_modules(flax_params):
    import torch.nn as tnn

    mods = []
    for i in range(4):
        k = np.asarray(flax_params[f"TorchConv_{i}"]["Conv_0"]["kernel"])
        b = np.asarray(flax_params[f"TorchConv_{i}"]["Conv_0"]["bias"])
        conv = tnn.Conv2d(k.shape[2], k.shape[3], 4, 2, 1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(b))
        mods.append(conv)
    dk = np.asarray(flax_params["TorchDense_0"]["Dense_0"]["kernel"])
    db = np.asarray(flax_params["TorchDense_0"]["Dense_0"]["bias"])
    fc = tnn.Linear(1024, dk.shape[1])
    h = w = 4
    c = 64
    perm = np.empty(h * w * c, np.int64)
    for ci in range(c):
        for hi in range(h):
            for wi in range(w):
                perm[ci * h * w + hi * w + wi] = hi * w * c + wi * c + ci
    with torch.no_grad():
        fc.weight.copy_(torch.from_numpy(dk[perm].T))
        fc.bias.copy_(torch.from_numpy(db))
    return mods, fc


def test_pxy_training_trajectory_matches_torch(rng):
    encoder = SpritesEncoderPxy()
    variables = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))

    steps = 5
    imgs = rng.uniform(0, 1, (steps, 8, 64, 64, 1)).astype(np.float32)
    codes = rng.uniform(-1, 1, (steps, 8, 3)).astype(np.float32)

    # ---- our stack: manual loop with externally supplied codes ----------
    tx = adam(2e-4)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def one_step(params, opt_state, img, code):
        matrix = code_to_matrix(PXY, code)
        trans = warp_affine(img, matrix, padding_mode="border")

        def loss_fn(p):
            real_code = encoder.apply({"params": p}, img, train=False)
            trans_code = encoder.apply({"params": p}, trans, train=False)
            rec = regularize(PXY, real_code, trans_code)
            return mse_loss(rec, code)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ours = []
    for s in range(steps):
        params, opt_state, loss = one_step(
            params, opt_state, jnp.asarray(imgs[s]), jnp.asarray(codes[s])
        )
        ours.append(float(loss))

    # ---- torch --------------------------------------------------------
    convs, fc = _torch_modules(variables["params"])
    t_params = [p for m in convs for p in m.parameters()] + list(fc.parameters())
    opt = torch.optim.Adam(t_params, lr=2e-4, betas=(0.5, 0.999), eps=1e-8)

    def t_forward(x):
        for conv in convs:
            x = TF.leaky_relu(conv(x), 0.1)
        return fc(x.reshape(x.shape[0], -1))

    theirs = []
    for s in range(steps):
        t_img = torch.from_numpy(np.transpose(imgs[s], (0, 3, 1, 2)))
        t_code = torch.from_numpy(codes[s])
        mat = _torch_pxy_matrix(t_code)
        grid = TF.affine_grid(mat[:, 0:2], t_img.size(), align_corners=False)
        t_trans = TF.grid_sample(
            t_img, grid, padding_mode="border", align_corners=False
        )
        rc = t_forward(t_img)
        tc = t_forward(t_trans)
        rm = _torch_pxy_matrix(rc)
        tm = _torch_pxy_matrix(tc)
        rel = tm @ torch.inverse(rm)
        rp = (rel[:, 0, 0] + rel[:, 1, 1]) / 2
        rec = torch.stack(
            [(rp - 1) / 0.1, rel[:, 0, 2] / rp / 0.1, rel[:, 1, 2] / rp / 0.1], 1
        )
        loss = torch.nn.MSELoss()(rec, t_code)
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss))

    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
    # the trajectory must actually move (optimizer really updating)
    assert ours[-1] != ours[0]
