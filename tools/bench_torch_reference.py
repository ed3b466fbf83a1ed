"""Measure the reference implementation's training throughput.

The reference publishes no benchmark numbers (BASELINE.md), so the
comparison point is measured here: a faithful reimplementation of the
CelebA per-batch work (G phase + D phase + info phase with the rpqxy
affine warp and regularizer, celebA/EAD-GAN_celebA.py:296-401) in
PyTorch, timed on this machine.  Only CPU torch is available in this
container; the recorded number is the reference-on-this-host baseline
that bench.py reports against.

Usage: python tools/bench_torch_reference.py [--batch 16] [--steps 5]
Writes BASELINE_MEASURED.json at the repo root.
"""

import argparse
import itertools
import json
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import spectral_norm


def build_generator(latent=200, classes=10, codes=8, ch=3):
    layers = [nn.ConvTranspose2d(latent + classes + codes, 1024, 4, 1, 0)]
    c_in = 1024
    for c_out in (512, 256, 128):
        layers += [
            nn.ConvTranspose2d(c_in, c_out, 4, 2, 1),
            nn.BatchNorm2d(c_out),
            nn.ReLU(),
        ]
        c_in = c_out
    layers += [nn.ConvTranspose2d(c_in, ch, 4, 2, 1), nn.Tanh()]
    return nn.Sequential(*layers)


def build_discriminator(classes=10, codes=8, ch=3):
    layers = []
    c_in = ch
    for c_out in (128, 256, 512, 1024):
        layers += [
            spectral_norm(nn.Conv2d(c_in, c_out, 4, 2, 1)),
            nn.LeakyReLU(0.1),
        ]
        c_in = c_out
    layers += [nn.Conv2d(c_in, 1 + classes + codes, 4, 1, 0)]
    return nn.Sequential(*layers)


def rpqxy_matrix(code):
    theta = code[:, 0] * math.pi / 9
    p = code[:, 1] * 0.2 + 1
    q = code[:, 2] * 0.2 + 1
    x = code[:, 3] * 0.1
    y = code[:, 4] * 0.1
    c, s = torch.cos(theta), torch.sin(theta)
    a00, a01, a10, a11 = c * p, -s * q, s * p, c * q
    zero, one = torch.zeros_like(p), torch.ones_like(p)
    row0 = torch.stack([a00, a01, a00 * x + a01 * y], dim=1)
    row1 = torch.stack([a10, a11, a10 * x + a11 * y], dim=1)
    row2 = torch.stack([zero, zero, one], dim=1)
    return torch.stack([row0, row1, row2], dim=1)


def rpqxy_regularize(real_code, trans_code):
    rm = rpqxy_matrix(real_code[:, :5])
    tm = rpqxy_matrix(trans_code[:, :5])
    rel = tm @ torch.inverse(rm)
    t1 = rel[:, 0, 0] * rel[:, 1, 0] - rel[:, 0, 1] * rel[:, 1, 1]
    t2 = rel[:, 0, 0] ** 2 + rel[:, 1, 1] ** 2 - rel[:, 0, 1] ** 2 - rel[:, 1, 0] ** 2
    th = 0.5 * torch.atan(2 * t1 / t2)
    ct, st = torch.cos(th), torch.sin(th)
    p = rel[:, 0, 0] * ct + rel[:, 1, 0] * st
    q = -rel[:, 0, 1] * st + rel[:, 1, 1] * ct
    x = (rel[:, 0, 2] * ct + rel[:, 1, 2] * st) / p
    y = (rel[:, 1, 2] * ct - rel[:, 0, 2] * st) / q
    out = torch.stack(
        [th / math.pi * 9, (p - 1) / 0.2, (q - 1) / 0.2, x / 0.1, y / 0.1], dim=1
    )
    return out


def split_heads(out, codes=8, classes=10):
    out = out.squeeze(-1).squeeze(-1)
    validity = torch.sigmoid(out[:, 0])
    cont = out[:, 1 : codes + 1]
    cat = F.softmax(out[:, codes + 1 : codes + 1 + classes], dim=1)
    return cat, cont, validity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    torch.manual_seed(0)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    G = build_generator().to(device)
    D = build_discriminator().to(device)

    bce = nn.BCELoss()
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    opt_g = torch.optim.Adam(G.parameters(), lr=1e-3, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_info = torch.optim.Adam(
        itertools.chain(G.parameters(), D.parameters()), lr=2e-4, betas=(0.5, 0.999)
    )

    B = args.batch
    real = torch.rand(B, 3, 64, 64) * 2 - 1

    def step():
        valid = torch.ones(B)
        fake = torch.zeros(B)
        z = torch.randn(B, 200)
        code = torch.rand(B, 8) * 2 - 1
        labels = torch.randint(0, 10, (B,))
        label_1h = F.one_hot(labels, 10).float()

        mat = rpqxy_matrix(code[:, :5])
        grid = F.affine_grid(mat[:, 0:2], real.size(), align_corners=False)
        scaled = F.grid_sample(real, grid, padding_mode="border", align_corners=False)

        gin = torch.cat([z, label_1h, code], dim=1)[:, :, None, None]

        opt_g.zero_grad()
        gen = G(gin)
        _, _, v = split_heads(D(gen))
        g_loss = bce(v, valid)
        g_loss.backward()
        opt_g.step()

        opt_d.zero_grad()
        _, _, vr = split_heads(D(scaled))
        _, _, vf = split_heads(D(gen.detach()))
        d_loss = (bce(vr, valid) + bce(vf, fake)) / 2
        d_loss.backward()
        opt_d.step()

        opt_info.zero_grad()
        gen = G(gin)
        pl, pc, _ = split_heads(D(gen))
        info1 = ce(pl, labels) + mse(pc, code)
        _, tc, _ = split_heads(D(scaled))
        _, rc, _ = split_heads(D(real))
        pred = rpqxy_regularize(rc, tc)
        info = info1 + mse(pred, code[:, :5])
        info.backward()
        opt_info.step()

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    ips = args.steps * B / dt

    result = {
        "celeba_train_images_per_sec": ips,
        "batch": B,
        "steps": args.steps,
        "device": device,
        "torch": torch.__version__,
        "sec_per_step": dt / args.steps,
    }
    print(json.dumps(result))
    out_path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
