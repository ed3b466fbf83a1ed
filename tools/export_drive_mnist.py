#!/usr/bin/env python
"""Exporter end-to-end drive: render from a framework-trained MNIST
generator using the REFERENCE's own inference script.

Flow:
1. Take a framework MNIST generator checkpoint (``--input``; when absent
   a random-init one is created — the drive proves interop, not sample
   quality).
2. ``cli.export_torch --kind mnist_generator`` -> reference-format
   ``generator_40000.pt``.
3. Stage ``/root/reference/MNIST/generate_image.py`` in a /tmp sandbox
   patched only for this container (``.cuda()`` strip; a minimal
   PIL-backed ``torchvision.utils`` shim, since torchvision is not in
   the image) and run it with torch CPU.
4. Verify the 7 ``test/varying_c*/0.png`` grids exist and are non-empty,
   and that the reference render matches OUR generator forward on the
   same static sweep inputs (max |diff| on the c1 grid).

Usage: python tools/export_drive_mnist.py [--input generator_%d.pt]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference/MNIST/generate_image.py"
sys.path.insert(0, REPO)

TORCHVISION_SHIM = {
    "__init__.py": "from . import transforms, utils, datasets\n",
    "transforms.py": "class Compose(list):\n    pass\n",
    "datasets.py": "",
    "utils.py": '''
import math
import torch


def make_grid(tensor, nrow=8, padding=2):
    b, c, h, w = tensor.shape
    nrows = math.ceil(b / nrow)
    grid = torch.zeros(
        c, nrows * (h + padding) + padding, nrow * (w + padding) + padding
    )
    for k in range(b):
        r, cc = divmod(k, nrow)
        grid[
            :,
            padding + r * (h + padding): padding + r * (h + padding) + h,
            padding + cc * (w + padding): padding + cc * (w + padding) + w,
        ] = tensor[k]
    return grid


def save_image(tensor, fp, nrow=8, padding=2, normalize=False):
    t = tensor.detach().cpu().float()
    if t.dim() == 4:
        t = make_grid(t, nrow, padding)
    if normalize:
        t = (t - t.min()) / (t.max() - t.min() + 1e-12)
    arr = (t.clamp(0, 1) * 255).round().byte().permute(1, 2, 0).numpy()
    from PIL import Image

    Image.fromarray(arr[:, :, 0] if arr.shape[2] == 1 else arr).save(fp)
''',
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", default="", help="framework mnist generator .pt")
    parser.add_argument("--sandbox", default="/tmp/export_drive_mnist")
    opt = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eadgan_tpu.cli.export_torch import main as export_main
    from eadgan_tpu.models import MnistGenerator
    from eadgan_tpu.train.checkpoint import restore_model, save_model
    from eadgan_tpu.train.state import ModelVars

    if os.path.isdir(opt.sandbox):
        shutil.rmtree(opt.sandbox)
    os.makedirs(opt.sandbox)

    model = MnistGenerator()
    dummies = (jnp.zeros((1, 62)), jnp.zeros((1, 10)), jnp.zeros((1, 7)))
    init = model.init(jax.random.PRNGKey(0), *dummies)
    mv = ModelVars.create(init)
    src = opt.input
    if not src:
        src = os.path.join(opt.sandbox, "generator_framework.pt")
        save_model(src, mv)
        print("no --input: using a random-init generator (interop drive)")
    mv = restore_model(src, mv)

    out_pt = os.path.join(opt.sandbox, "generator_40000.pt")
    export_main(["--kind", "mnist_generator", "--input", src, "--output", out_pt])

    shim = os.path.join(opt.sandbox, "torchvision")
    os.makedirs(shim)
    for name, text in TORCHVISION_SHIM.items():
        with open(os.path.join(shim, name), "w") as f:
            f.write(text)

    with open(REFERENCE) as f:
        script = f.read().replace("generator.cuda()", "").replace(".cuda()", "")
    with open(os.path.join(opt.sandbox, "generate_image.py"), "w") as f:
        f.write(script)

    proc = subprocess.run(
        [sys.executable, "generate_image.py"],
        cwd=opt.sandbox, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:])
        return 1

    grids = [
        os.path.join(opt.sandbox, "test", f"varying_c{i}", "0.png")
        for i in range(1, 8)
    ]
    missing = [g for g in grids if not os.path.exists(g) or os.path.getsize(g) == 0]
    if missing:
        print(f"FAIL: missing grids {missing}")
        return 1

    # cross-check: the reference's c1 render vs OUR generator forward on
    # the same static sweep (z=0, labels 0..9 row-major, c1 ramp)
    from PIL import Image

    ref_grid = np.asarray(Image.open(grids[0]), np.float32) / 255.0
    n_row = 10
    z = np.zeros((100, 62), np.float32)
    label = np.zeros((100, 10), np.float32)
    label[np.arange(100), np.repeat(np.arange(10), 10)] = 1.0
    c_varied = -np.tile(np.linspace(-1, 1, n_row), n_row)[:, None].astype(np.float32)
    code = np.concatenate([c_varied, np.zeros((100, 6), np.float32)], axis=1)
    # train=False: the reference script evals the generator (BN running
    # stats), and our inference CLI mirrors that
    imgs = model.apply(
        {"params": mv.params, "batch_stats": mv.stats},
        jnp.asarray(z), jnp.asarray(label), jnp.asarray(code),
        train=False,
    )
    from eadgan_tpu.sample import make_grid as our_grid

    ours = our_grid(np.asarray(imgs), nrow=10, padding=2)[..., 0]
    lo, hi = ours.min(), ours.max()
    ours_norm = (ours - lo) / (hi - lo + 1e-12)  # reference normalize=True
    diff = float(np.abs(ours_norm - ref_grid).max())
    print(f"reference-vs-ours c1 grid max|diff| = {diff:.5f} (8-bit quantized)")
    ok = diff < 0.02
    print("PASS" if ok else "FAIL", f"- grids under {opt.sandbox}/test/")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
