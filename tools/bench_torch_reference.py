"""Measure the reference implementation's training throughput.

The reference publishes no benchmark numbers (BASELINE.md), so the
comparison points are measured here: faithful reimplementations of the
per-batch work of each pipeline in PyTorch, timed on this machine —

* celeba:   G + D + info phases with the rpqxy warp and regularizer
            (celebA/EAD-GAN_celebA.py:296-401)
* dsprites: frozen-pxy align, D phase, joint G+E info phase with the
            closed-form rp regularizer (dSprites/rp.py:236-346)
* mnist:    LSGAN G/D phases + neural-approximator info phase
            (MNIST/EAD-GAN_rpqmnxy.py:337-446)
* generate: CelebA generator.eval() inference (celebA/gen_imgs.py)

Only CPU torch is available in this container; the recorded numbers are
the reference-on-this-host baselines that bench.py reports against.

Usage: python tools/bench_torch_reference.py [--batch 16] [--steps 5]
       [--pipeline celeba|dsprites|mnist|generate|all]
Merges results into BASELINE_MEASURED.json at the repo root.
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


# --- dSprites rp pipeline (dSprites/rp.py) --------------------------------


def build_sprites_pxy(ch=1, out_dim=3):
    convs = []
    chans = [ch, 32, 32, 64, 64]
    for i in range(4):
        convs += [nn.Conv2d(chans[i], chans[i + 1], 4, 2, 1), nn.LeakyReLU(0.1)]
    return nn.Sequential(*convs, nn.Flatten(), nn.Linear(1024, out_dim))


def build_sprites_d(ch=1):
    convs = []
    chans = [ch, 32, 32, 64, 64]
    for i in range(4):
        convs += [spectral_norm(nn.Conv2d(chans[i], chans[i + 1], 4, 2, 1)), nn.LeakyReLU(0.2)]
    return nn.Sequential(
        *convs, nn.Flatten(),
        spectral_norm(nn.Linear(1024, 128)), nn.LeakyReLU(0.2),
        nn.Linear(128, 1), nn.Sigmoid(),
    )


class SpritesG(nn.Module):
    def __init__(self, in_dim=7, ch=1):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(in_dim, 128), nn.ReLU(), nn.Linear(128, 1024), nn.ReLU()
        )
        layers = []
        for _ in range(3):
            layers += [nn.ConvTranspose2d(64, 64, 4, 2, 1), nn.BatchNorm2d(64), nn.ReLU()]
        layers += [nn.ConvTranspose2d(64, ch, 4, 2, 1), nn.Sigmoid()]
        self.conv = nn.Sequential(*layers)

    def forward(self, z):
        return self.conv(self.fc(z).reshape(-1, 64, 4, 4))


class SpritesE(nn.Module):
    def __init__(self, ch=1, n_classes=3, code_dim=4):
        super().__init__()
        convs = []
        chans = [ch, 32, 32, 64, 64]
        for i in range(4):
            convs += [spectral_norm(nn.Conv2d(chans[i], chans[i + 1], 4, 2, 1)), nn.LeakyReLU(0.2)]
        self.trunk = nn.Sequential(
            *convs, nn.Flatten(),
            spectral_norm(nn.Linear(1024, 128)), nn.LeakyReLU(0.2),
            spectral_norm(nn.Linear(128, 128)), nn.LeakyReLU(0.2),
        )
        self.cat = nn.Sequential(spectral_norm(nn.Linear(128, n_classes)), nn.Softmax(dim=1))
        self.cont = spectral_norm(nn.Linear(128, code_dim))

    def forward(self, x):
        h = self.trunk(x)
        return self.cat(h), self.cont(h)


def rp_matrix(code):
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


def pxy_align_matrix(code):
    x = code[:, 1] * 0.1
    y = code[:, 2] * 0.1
    zero, one = torch.zeros_like(x), torch.ones_like(x)
    r0 = torch.stack([one, zero, x], 1)
    r1 = torch.stack([zero, one, y], 1)
    r2 = torch.stack([zero, zero, one], 1)
    return torch.stack([r0, r1, r2], 1)


def warp(img, matrix):
    grid = F.affine_grid(matrix[:, 0:2], img.size(), align_corners=False)
    return F.grid_sample(img, grid, padding_mode="border", align_corners=False)


def rp_regularize(real_code, trans_code):
    rel = rp_matrix(trans_code[:, :4]) @ torch.inverse(rp_matrix(real_code[:, :4]))
    theta = torch.atan((rel[:, 1, 0] - rel[:, 0, 1]) / (rel[:, 0, 0] + rel[:, 1, 1]))
    ct, st = torch.cos(theta), torch.sin(theta)
    p = 0.5 * (ct * (rel[:, 0, 0] + rel[:, 1, 1]) + st * (rel[:, 1, 0] - rel[:, 0, 1]))
    x = (rel[:, 0, 2] * ct + rel[:, 1, 2] * st) / p
    y = (rel[:, 1, 2] * ct - rel[:, 0, 2] * st) / p
    return torch.stack([theta / math.pi * 9, (p - 1) / 0.2, x / 0.1, y / 0.1], 1)


def mi_loss(c_given_x, c):
    eps = 1e-8
    cond = torch.mean(-torch.sum(torch.log(c_given_x + eps) * c, dim=1))
    ent = torch.mean(-torch.sum(torch.log(c + eps) * c, dim=1))
    return cond + ent


def make_dsprites_step(B):
    torch.manual_seed(0)
    G, D, E, PXY = SpritesG(), build_sprites_d(), SpritesE(), build_sprites_pxy()
    PXY.eval()
    opt_d = torch.optim.Adam(D.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_info = torch.optim.Adam(
        itertools.chain(G.parameters(), E.parameters()), lr=1e-4, betas=(0.5, 0.999)
    )
    bce = nn.BCELoss()
    mse = nn.MSELoss()
    img = torch.rand(B, 1, 64, 64)
    valid, fake = torch.ones(B, 1), torch.zeros(B, 1)

    def step():
        code_d = torch.rand(B, 4) * 2 - 1
        onehot_d = torch.eye(3)[torch.randint(0, 3, (B,))]
        code_i = torch.rand(B, 4) * 2 - 1
        onehot_i = torch.eye(3)[torch.randint(0, 3, (B,))]

        with torch.no_grad():
            align_code = PXY(img)
        align_img = warp(img, torch.inverse(pxy_align_matrix(align_code)))

        trans_img = warp(align_img, rp_matrix(code_d))
        gen = G(torch.cat([onehot_d, code_d], 1))
        d_loss = (bce(D(trans_img), valid) + bce(D(gen.detach()), fake)) / 2
        opt_d.zero_grad()
        d_loss.backward()
        opt_d.step()

        gen = G(torch.cat([onehot_i, code_i], 1))
        rec_cat, rec_cont = E(gen)
        total = (
            mi_loss(rec_cat, onehot_i)
            + mse(rec_cont, code_i)
            + bce(D(gen), valid)
        )
        trans_img_i = warp(align_img, rp_matrix(code_i))
        a_cat, a_cont = E(align_img)
        t_cat, t_cont = E(trans_img_i)
        total = total + mse(rp_regularize(a_cont, t_cont), code_i)
        total = total + mi_loss(t_cat, a_cat.detach())
        opt_info.zero_grad()
        total.backward()
        opt_info.step()

    return step


# --- MNIST rpqmnxy pipeline (MNIST/EAD-GAN_rpqmnxy.py) ---------------------


class MnistG(nn.Module):
    def __init__(self):
        super().__init__()
        self.l1 = nn.Linear(79, 128 * 64)
        self.conv = nn.Sequential(
            nn.BatchNorm2d(128),
            nn.Upsample(scale_factor=2),
            nn.Conv2d(128, 128, 3, 1, 1),
            nn.BatchNorm2d(128, 0.8),
            nn.LeakyReLU(0.2),
            nn.Upsample(scale_factor=2),
            nn.Conv2d(128, 64, 3, 1, 1),
            nn.BatchNorm2d(64, 0.8),
            nn.LeakyReLU(0.2),
            nn.Conv2d(64, 1, 3, 1, 1),
            nn.Tanh(),
        )

    def forward(self, z, label, code):
        return self.conv(self.l1(torch.cat([z, label, code], 1)).reshape(-1, 128, 8, 8))


def build_mnist_d():
    def block(cin, cout):
        return [spectral_norm(nn.Conv2d(cin, cout, 3, 2, 1)), nn.LeakyReLU(0.2)]

    return nn.Sequential(
        *block(1, 16), *block(16, 32), *block(32, 64), *block(64, 128),
        nn.Flatten(), spectral_norm(nn.Linear(512, 1)),
    )


class MnistE(nn.Module):
    def __init__(self):
        super().__init__()

        def block(cin, cout, bn):
            layers = [spectral_norm(nn.Conv2d(cin, cout, 3, 2, 1)), nn.LeakyReLU(0.2)]
            if bn:
                layers.append(nn.BatchNorm2d(cout, 0.8))
            return layers

        self.trunk = nn.Sequential(
            *block(1, 16, False), *block(16, 32, True),
            *block(32, 64, True), *block(64, 128, True), nn.Flatten(),
        )
        self.aux = nn.Sequential(spectral_norm(nn.Linear(512, 10)), nn.Softmax(dim=1))
        self.latent = spectral_norm(nn.Linear(512, 7))
        self.noise = spectral_norm(nn.Linear(512, 62))

    def forward(self, x):
        h = self.trunk(x)
        return self.aux(h), self.latent(h), self.noise(h)


def build_approx():
    layers = []
    dims = [6, 256, 256, 256, 256]
    for i in range(4):
        layers += [nn.Linear(dims[i], dims[i + 1]), nn.LeakyReLU()]
    return nn.Sequential(*layers, nn.Linear(256, 7))


def rpqmnxy_params(code):
    return torch.stack(
        [
            code[:, 0] * math.pi / 9,
            code[:, 1] * 0.2 + 1,
            code[:, 2] * 0.2 + 1,
            code[:, 3] * 0.2,
            code[:, 4] * 0.2,
            code[:, 5] * 0.1,
            code[:, 6] * 0.1,
        ],
        1,
    )


def rpqmnxy_matrix(code):
    pr = rpqmnxy_params(code)
    theta, p, q, m, n, x, y = (pr[:, i] for i in range(7))
    c, s = torch.cos(theta), torch.sin(theta)
    a00 = c * p - s * q * n
    a01 = c * p * m - s * q
    a10 = s * p + c * q * n
    a11 = s * p * m + c * q
    zero, one = torch.zeros_like(p), torch.ones_like(p)
    r0 = torch.stack([a00, a01, a00 * x + a01 * y], 1)
    r1 = torch.stack([a10, a11, a10 * x + a11 * y], 1)
    r2 = torch.stack([zero, zero, one], 1)
    return torch.stack([r0, r1, r2], 1)


def params_to_code(pr):
    return torch.stack(
        [
            pr[:, 0] / math.pi * 9,
            (pr[:, 1] - 1) / 0.2,
            (pr[:, 2] - 1) / 0.2,
            pr[:, 3] / 0.2,
            pr[:, 4] / 0.2,
            pr[:, 5] / 0.1,
            pr[:, 6] / 0.1,
        ],
        1,
    )


def make_mnist_step(B):
    torch.manual_seed(0)
    G, D, E, A = MnistG(), build_mnist_d(), MnistE(), build_approx()
    A.eval()
    opt_g = torch.optim.Adam(G.parameters(), lr=1e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_info = torch.optim.Adam(
        itertools.chain(G.parameters(), E.parameters()), lr=1e-4, betas=(0.5, 0.999)
    )
    mse = nn.MSELoss()
    ce = nn.CrossEntropyLoss()
    img = torch.rand(B, 1, 32, 32) * 2 - 1
    valid, fake = torch.ones(B, 1), torch.zeros(B, 1)

    def step():
        z = torch.randn(B, 62)
        code = torch.rand(B, 7) * 2 - 1
        labels = torch.randint(0, 10, (B,))
        onehot = torch.eye(10)[labels]

        grid = F.affine_grid(rpqmnxy_matrix(code)[:, 0:2], img.size(), align_corners=False)
        scaled = F.grid_sample(img, grid, padding_mode="border", align_corners=False)

        gen = G(z, onehot, code)
        g_loss = mse(D(gen), valid)
        opt_g.zero_grad()
        g_loss.backward()
        opt_g.step()

        d_loss = (mse(D(scaled), valid) + mse(D(gen.detach()), fake)) / 2
        opt_d.zero_grad()
        d_loss.backward()
        opt_d.step()

        gen = G(z, onehot, code)
        pl, pc, _ = E(gen)
        info = ce(pl, labels) + 0.1 * mse(pc, code)
        _, tc, _ = E(scaled)
        _, rc, _ = E(img)
        rel = rpqmnxy_matrix(tc) @ torch.inverse(rpqmnxy_matrix(rc))
        flat = torch.cat([rel[:, 0], rel[:, 1]], 1)
        info = info + 0.1 * mse(params_to_code(A(flat)), code)
        opt_info.zero_grad()
        info.backward()
        opt_info.step()

    return step


def make_generate_step(B):
    torch.manual_seed(0)
    G = build_generator()
    G.eval()
    z = torch.randn(B, 200)
    onehot = torch.eye(10)[torch.randint(0, 10, (B,))]
    code = torch.rand(B, 8) * 2 - 1
    gin = torch.cat([z, onehot, code], dim=1)[:, :, None, None]

    def step():
        with torch.no_grad():
            G(gin)

    return step


def _time_steps(step, steps, warmup):
    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument(
        "--pipeline",
        default="celeba",
        choices=["celeba", "dsprites", "mnist", "generate", "all"],
    )
    args = ap.parse_args()

    torch.manual_seed(0)
    device = "cuda" if torch.cuda.is_available() else "cpu"

    out_path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")
    result = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            result = json.load(f)
    # measurement conditions are recorded PER PIPELINE: a later partial
    # re-run must not relabel throughputs measured under other settings
    result.pop("batch", None), result.pop("steps", None)
    result.pop("device", None), result.pop("torch", None)
    result.pop("sec_per_step", None)
    conditions = {
        "batch": args.batch, "steps": args.steps, "device": device,
        "torch": torch.__version__,
    }

    pipelines = (
        ["celeba", "dsprites", "mnist", "generate"]
        if args.pipeline == "all"
        else [args.pipeline]
    )
    B = args.batch
    for name in pipelines:
        if name == "celeba":
            dt = _bench_celeba(args, device)
            result["celeba_train_images_per_sec"] = args.steps * B / dt
            result["celeba_meta"] = dict(conditions, sec_per_step=dt / args.steps)
        elif name == "dsprites":
            dt = _time_steps(make_dsprites_step(B), args.steps, args.warmup)
            result["dsprites_train_images_per_sec"] = args.steps * B / dt
            result["dsprites_meta"] = dict(conditions)
        elif name == "mnist":
            dt = _time_steps(make_mnist_step(B), args.steps, args.warmup)
            result["mnist_train_images_per_sec"] = args.steps * B / dt
            result["mnist_meta"] = dict(conditions)
        elif name == "generate":
            dt = _time_steps(make_generate_step(B), args.steps, args.warmup)
            result["celeba_generate_images_per_sec"] = args.steps * B / dt
            result["generate_meta"] = dict(conditions)

    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


def _bench_celeba(args, device):
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

    return _time_steps(step, args.steps, args.warmup)


if __name__ == "__main__":
    main()
