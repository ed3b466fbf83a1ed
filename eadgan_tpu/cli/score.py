"""Disentanglement-score CLI — covers the twelve reference score
scripts (``python dSprites/score/<Metric>.py`` and the colored
variants) behind one entry point:

    python -m eadgan_tpu.cli.score --metric BetVAE [--colored]
    python -m eadgan_tpu.cli.score --metric all

Loads the frozen stage-1 aligner and the trained category/continuous
encoder from the reference checkpoint names (``encoder_pxy_50000.pt`` /
``encoder_pxy_color_50000.pt`` + ``encoder_500000.pt``,
dSprites/score/BetVAE.py:193-205).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from eadgan_tpu.cli import common  # noqa: F401  (EADGAN_PLATFORM hook)
from eadgan_tpu.data import load_dsprites
from eadgan_tpu.eval import (
    Representer,
    betavae_score,
    dci_score,
    factorvae_score,
    fstat_score,
    make_metric_data,
    mig_score,
    sap_score,
)
from eadgan_tpu.models import SpritesEncoder, SpritesEncoderPxy
from eadgan_tpu.train.checkpoint import restore_model
from eadgan_tpu.train.state import ModelVars

_METRICS = ["BetVAE", "FactorVAE", "MIG", "SAP", "DCI", "F_score"]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--metric", type=str, default="all", choices=_METRICS + ["all"])
    parser.add_argument("--colored", action="store_true")
    parser.add_argument("--encoder_pxy", type=str, default="")
    parser.add_argument("--encoder", type=str, default="")
    parser.add_argument("--data_dir", type=str, default="..")
    parser.add_argument("--ckpt_dir", type=str, default=".")
    parser.add_argument("--dci_regressor", type=str, default="Lasso")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n_groups", type=int, default=500)
    parser.add_argument("--allow_fresh", action="store_true",
                        help="random encoders when checkpoints are absent (plumbing tests)")
    parser.add_argument("--json_out", type=str, default="")
    opt = parser.parse_args(argv)
    print(opt)

    colored = opt.colored
    channels = 3 if colored else 1
    code_dim = 7 if colored else 4

    pxy_encoder = SpritesEncoderPxy(out_dim=6 if colored else 3, channels=channels)
    cat_encoder = SpritesEncoder(n_classes=3, code_dim=code_dim, channels=channels)

    dummy = jnp.zeros((1, 64, 64, channels))
    pxy_vars = pxy_encoder.init(jax.random.PRNGKey(1), dummy)
    cat_init = cat_encoder.init(jax.random.PRNGKey(2), dummy)

    pxy_default = "encoder_pxy_color_50000.pt" if colored else "encoder_pxy_50000.pt"
    pxy_path = opt.encoder_pxy or os.path.join(opt.ckpt_dir, pxy_default)
    enc_path = opt.encoder or os.path.join(opt.ckpt_dir, "encoder_500000.pt")

    if os.path.exists(pxy_path):
        mv = restore_model(pxy_path, ModelVars.create(pxy_vars))
        pxy_vars = {"params": mv.params}
        print(f"loaded aligner {pxy_path}")
    elif not opt.allow_fresh:
        raise SystemExit(f"missing {pxy_path} (pass --allow_fresh for plumbing tests)")

    cat_vars = {"params": cat_init["params"], "batch_stats": cat_init.get("batch_stats", {})}
    if os.path.exists(enc_path):
        mv = restore_model(enc_path, ModelVars.create(cat_init))
        cat_vars = {"params": mv.params, "batch_stats": mv.stats}
        print(f"loaded encoder {enc_path}")
    elif not opt.allow_fresh:
        raise SystemExit(f"missing {enc_path} (pass --allow_fresh for plumbing tests)")

    rng = np.random.default_rng(opt.seed)
    data = load_dsprites(opt.data_dir)
    metric_data = make_metric_data(data, rng, n_groups=opt.n_groups)
    representer = Representer(
        pxy_encoder, pxy_vars, cat_encoder, cat_vars, colored=colored, seed=opt.seed
    )

    wanted = _METRICS if opt.metric == "all" else [opt.metric]
    results = {}
    for name in wanted:
        if name == "BetVAE":
            results.update(betavae_score(metric_data, representer))
        elif name == "FactorVAE":
            results.update(factorvae_score(metric_data, representer))
        elif name == "MIG":
            if data.latents_values is None:
                print("skipping MIG: dataset has no latents_values")
            else:
                results.update(
                    mig_score(
                        data.imgs, data.latents_values[:, 1:], representer, rng=rng
                    )
                )
        elif name == "SAP":
            results.update(sap_score(metric_data, representer))
        elif name == "DCI":
            results.update(dci_score(metric_data, representer, opt.dci_regressor))
        elif name == "F_score":
            results.update(fstat_score(metric_data, representer))

    scalars = {k: float(v) for k, v in results.items() if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
    for k, v in scalars.items():
        print(f"{k}: {v:.6f}")
    if opt.json_out:
        with open(opt.json_out, "w") as f:
            json.dump(scalars, f, indent=2)


if __name__ == "__main__":
    main()
