"""Noise-floor probe for the BetaVAE scalar at 500k-step saturation.

All 8 other scalars are bit-equal on the same representations, so the
cross-stack feature agreement is ~1e-6; this measures whether the
LogisticRegression *training accuracy* (lbfgs capped at 100 iters,
sklearn default) is stable at that input-perturbation level.
"""
import os, sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tools.metric_parity import build_npz, legacy_metric_data, NPZ_NAME
from eadgan_tpu.eval import Representer
from eadgan_tpu.interop import import_sprites_encoder, import_sprites_encoder_pxy
from eadgan_tpu.interop.torch_import import converge_sn_state, load_torch_state_dict
from eadgan_tpu.models import SpritesEncoder, SpritesEncoderPxy
from sklearn.linear_model import LogisticRegression

SEED = 1234
WDIR = "/tmp/parity_weights_gray"
SANDBOX = "/tmp/betavae_probe"
os.makedirs(SANDBOX, exist_ok=True)
npz_path = os.path.join(SANDBOX, NPZ_NAME)
if not os.path.exists(npz_path):
    build_npz(npz_path)

pxy_vars = import_sprites_encoder_pxy(
    load_torch_state_dict(os.path.join(WDIR, "encoder_pxy_50000.pt")))
cat_vars = import_sprites_encoder(
    load_torch_state_dict(os.path.join(WDIR, "encoder_500000.pt")))
pxy_encoder = SpritesEncoderPxy(out_dim=3, channels=1)
cat_encoder = SpritesEncoder(n_classes=3, code_dim=4, channels=1)
cat_vars = converge_sn_state(cat_encoder, cat_vars, jnp.zeros((1, 64, 64, 1)))
cat_vars = {"params": cat_vars["params"],
            "batch_stats": cat_vars.get("batch_stats", {})}

z = np.load(npz_path, allow_pickle=True, encoding="latin1")
md = z["metadata"][()]
data = legacy_metric_data(z["imgs"], md["latents_sizes"],
                          md["latents_possible_values"], md["latents_names"],
                          SEED, False)
representer = Representer(pxy_encoder, pxy_vars, cat_encoder, cat_vars,
                          colored=False)

features, labels = [], []
for group in data["groups"]:
    rep = representer(group["img"])
    diff = np.abs(rep[0::2] - rep[1::2])
    features.append(diff.mean(axis=0))
    labels.append(group["label"])
features = np.vstack(features)
labels = np.asarray(labels)

base = LogisticRegression().fit(features, labels).score(features, labels)
conv = LogisticRegression(max_iter=100000).fit(features, labels).score(features, labels)
print(f"ours default(lbfgs,100it): {base:.4f}   converged(1e5 it): {conv:.4f}")

scale = np.abs(features).mean()
for rel in (1e-6, 1e-5):
    accs = []
    rng = np.random.default_rng(0)
    for _ in range(12):
        f2 = features + rng.standard_normal(features.shape) * rel * scale
        accs.append(LogisticRegression().fit(f2, labels).score(f2, labels))
    accs = np.array(accs)
    print(f"jitter rel={rel:g}: acc min={accs.min():.4f} max={accs.max():.4f} "
          f"spread={accs.max()-accs.min():.4f} n_distinct={len(set(np.round(accs,4)))}")
