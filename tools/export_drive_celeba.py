#!/usr/bin/env python
"""Exporter end-to-end drive: render from a framework-trained CelebA
checkpoint using the REFERENCE's own inference script.

Flow (celebA analogue of tools/export_drive_mnist.py):
1. Take a framework ``checkpoint_%d.tar`` pytree (``--input``; when
   absent a random-init one is created — the drive proves interop, not
   sample quality).
2. ``cli.export_torch --kind celeba_checkpoint`` -> reference-format
   ``checkpoint_600000.tar`` (torch state_dicts + epoch/batches_done,
   matching celebA/EAD-GAN_celebA.py:414-423).
3. Stage ``/root/reference/celebA/gen_imgs.py`` in a /tmp sandbox
   patched only for this container (``.cuda()`` strip; a minimal
   PIL-backed ``torchvision`` shim, since torchvision is not in the
   image) and run it with torch CPU — the consumer that loads
   ``checkpoint_600000.tar`` at celebA/gen_imgs.py:106-114.
4. Verify the 8 ``images/varying_c*/0.png`` sweeps exist and are
   non-empty, and that the reference render matches OUR generator
   forward on the same static sweep inputs (max |diff| on the c1 grid,
   reproducing gen_imgs.py:162-172's code construction).

Usage: python tools/export_drive_celeba.py [--input checkpoint_600000.tar]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference/celebA/gen_imgs.py"
sys.path.insert(0, REPO)

from export_drive_mnist import TORCHVISION_SHIM  # noqa: E402  (same shim)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--input", default="", help="framework celeba checkpoint_%d.tar pytree"
    )
    parser.add_argument("--sandbox", default="/tmp/export_drive_celeba")
    opt = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eadgan_tpu.cli.export_torch import main as export_main
    from eadgan_tpu.models import CelebaDiscriminator, CelebaGenerator
    from eadgan_tpu.train.checkpoint import restore_pytree, save_pytree
    from eadgan_tpu.train.state import ModelVars

    if os.path.isdir(opt.sandbox):
        shutil.rmtree(opt.sandbox)
    os.makedirs(opt.sandbox)

    g = CelebaGenerator()
    g_dummies = (jnp.zeros((1, 200)), jnp.zeros((1, 10)), jnp.zeros((1, 8)))

    def split(model, *dummies):
        mv = ModelVars.create(model.init(jax.random.PRNGKey(0), *dummies))
        return {"params": mv.params, "stats": mv.stats}

    template = {
        "discriminator_state_dict": split(
            CelebaDiscriminator(), jnp.zeros((1, 64, 64, 3))
        ),
        "generator_state_dict": split(g, *g_dummies),
        "epoch": 0,
        "batches_done": 0,
    }
    src = opt.input
    if not src:
        src = os.path.join(opt.sandbox, "checkpoint_framework.tar")
        save_pytree(src, template)
        print("no --input: using a random-init checkpoint (interop drive)")
    tree = restore_pytree(src, template)

    out_tar = os.path.join(opt.sandbox, "checkpoint_600000.tar")
    export_main(["--kind", "celeba_checkpoint", "--input", src, "--output", out_tar])

    shim = os.path.join(opt.sandbox, "torchvision")
    os.makedirs(shim)
    for name, text in TORCHVISION_SHIM.items():
        with open(os.path.join(shim, name), "w") as f:
            f.write(text)

    with open(REFERENCE) as f:
        # "pass" keeps the `if cuda:` block at :120-121 syntactically valid
        script = f.read().replace("generator.cuda()", "pass").replace(".cuda()", "")
    with open(os.path.join(opt.sandbox, "gen_imgs.py"), "w") as f:
        f.write(script)

    proc = subprocess.run(
        [sys.executable, "gen_imgs.py"],
        cwd=opt.sandbox, capture_output=True, text=True, timeout=900,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:])
        return 1

    grids = [
        os.path.join(opt.sandbox, "images", f"varying_c{i}", "0.png")
        for i in range(1, 9)
    ]
    missing = [p for p in grids if not os.path.exists(p) or os.path.getsize(p) == 0]
    if missing:
        print(f"FAIL: missing grids {missing}")
        return 1

    # cross-check: the reference's c1 render vs OUR generator forward on
    # the same static sweep (z=0, labels 0..9 per row, c1 ramp repeated
    # down columns — gen_imgs.py:131-135,162-164)
    from PIL import Image

    ref_grid = np.asarray(Image.open(grids[0]), np.float32) / 255.0
    n_row = 10
    z = np.zeros((100, 200), np.float32)
    label = np.zeros((100, 10), np.float32)
    label[np.arange(100), np.tile(np.arange(10), 10)] = 1.0
    c_varied = np.repeat(
        np.linspace(-1.0, 1.0, n_row)[:, None], n_row, 0
    ).astype(np.float32)
    code = np.concatenate([c_varied, np.zeros((100, 7), np.float32)], axis=1)
    gsub = tree["generator_state_dict"]
    imgs = g.apply(
        {"params": gsub["params"], "batch_stats": gsub["stats"]},
        jnp.asarray(z), jnp.asarray(label), jnp.asarray(code),
        train=False,
    )
    from eadgan_tpu.sample import make_grid as our_grid

    ours = our_grid(np.asarray(imgs), nrow=10, padding=2)
    lo, hi = ours.min(), ours.max()
    ours_norm = (ours - lo) / (hi - lo + 1e-12)  # reference normalize=True
    diff = float(np.abs(ours_norm - ref_grid).max())
    print(f"reference-vs-ours c1 grid max|diff| = {diff:.5f} (8-bit quantized)")
    ok = diff < 0.02
    print("PASS" if ok else "FAIL", f"- sweeps under {opt.sandbox}/images/")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
