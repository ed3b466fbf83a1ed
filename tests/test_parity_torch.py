"""End-to-end numerical parity vs torch: the complete dSprites pxy loss
computation (conv encoder -> affine warp -> closed-form relative-code
recovery -> MSE) with identical weights must agree across frameworks.

This is the loss-curve-parity check of SURVEY.md section 7 in miniature:
it exercises conv geometry, the STN semantics, the matrix algebra, and
the regularizer together through both stacks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eadgan_tpu.losses import mse_loss
from eadgan_tpu.models import SpritesEncoderPxy
from eadgan_tpu.ops import warp_affine
from eadgan_tpu.transforms import PXY, code_to_matrix, regularize

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402


def build_torch_encoder(flax_params):
    """Torch conv trunk with weights copied from the flax encoder."""
    convs = []
    for i in range(4):
        kernel = np.asarray(flax_params[f"TorchConv_{i}"]["Conv_0"]["kernel"])
        bias = np.asarray(flax_params[f"TorchConv_{i}"]["Conv_0"]["bias"])
        conv = tnn.Conv2d(kernel.shape[2], kernel.shape[3], 4, 2, 1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(bias))
        convs.append(conv)

    dk = np.asarray(flax_params["TorchDense_0"]["Dense_0"]["kernel"])  # (1024, 3)
    db = np.asarray(flax_params["TorchDense_0"]["Dense_0"]["bias"])
    fc = tnn.Linear(1024, dk.shape[1])
    # flax flattens NHWC (h, w, c); torch flattens NCHW (c, h, w):
    # permute the dense kernel's input rows accordingly.
    h = w = 4
    c = 64
    perm = np.empty(h * w * c, np.int64)
    for ci in range(c):
        for hi in range(h):
            for wi in range(w):
                torch_idx = ci * h * w + hi * w + wi
                flax_idx = hi * w * c + wi * c + ci
                perm[torch_idx] = flax_idx
    with torch.no_grad():
        fc.weight.copy_(torch.from_numpy(dk[perm].T))
        fc.bias.copy_(torch.from_numpy(db))

    def forward(x_nchw):
        x = x_nchw
        for conv in convs:
            x = TF.leaky_relu(conv(x), 0.1)
        return fc(x.reshape(x.shape[0], -1))

    return forward


def _torch_pxy_matrix(code):
    p = code[:, 0] * 0.1 + 1
    x = code[:, 1] * 0.1
    y = code[:, 2] * 0.1
    zero, one = torch.zeros_like(p), torch.ones_like(p)
    row0 = torch.stack([p, zero, p * x], 1)
    row1 = torch.stack([zero, p, p * y], 1)
    row2 = torch.stack([zero, zero, one], 1)
    return torch.stack([row0, row1, row2], 1)


def test_pxy_loss_parity(rng):
    encoder = SpritesEncoderPxy()
    variables = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))

    img = rng.uniform(0, 1, (8, 64, 64, 1)).astype(np.float32)
    code = rng.uniform(-1, 1, (8, 3)).astype(np.float32)

    # ---- our stack -------------------------------------------------------
    matrix = code_to_matrix(PXY, jnp.asarray(code))
    trans = warp_affine(jnp.asarray(img), matrix, padding_mode="border")
    real_code = encoder.apply(variables, jnp.asarray(img), train=False)
    trans_code = encoder.apply(variables, trans, train=False)
    rec = regularize(PXY, real_code, trans_code)
    ours = float(mse_loss(rec, jnp.asarray(code)))

    # ---- torch with the same weights ------------------------------------
    t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    t_code = torch.from_numpy(code)
    t_forward = build_torch_encoder(variables["params"])

    t_matrix = _torch_pxy_matrix(t_code)
    t_grid = TF.affine_grid(t_matrix[:, 0:2], t_img.size(), align_corners=False)
    t_trans = TF.grid_sample(t_img, t_grid, padding_mode="border", align_corners=False)

    t_real = t_forward(t_img)
    t_transcode = t_forward(t_trans)

    rm = _torch_pxy_matrix(t_real)
    tm = _torch_pxy_matrix(t_transcode)
    rel = tm @ torch.inverse(rm)
    rp = (rel[:, 0, 0] + rel[:, 1, 1]) / 2
    rx = rel[:, 0, 2] / rp
    ry = rel[:, 1, 2] / rp
    t_rec = torch.stack([(rp - 1) / 0.1, rx / 0.1, ry / 0.1], 1)
    theirs = float(tnn.MSELoss()(t_rec, t_code))

    np.testing.assert_allclose(
        np.asarray(real_code), t_real.detach().numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)
