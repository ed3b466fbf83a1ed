"""Convert reference PyTorch state_dicts to flax parameter trees.

Weight-layout mappings (verified numerically against torch):

* ``Conv2d``          torch (out, in, kh, kw)  -> flax (kh, kw, in, out)
* ``ConvTranspose2d`` torch (in, out, kh, kw)  -> flax (kh, kw, in, out)
                      **with the spatial taps flipped** (lax.conv_transpose
                      correlates an unflipped kernel; torch's transposed
                      conv applies the flipped one)
* ``Linear``          torch (out, in) -> flax (in, out); linears that
                      consume a flattened conv map additionally permute
                      their input rows from torch's (C, H, W) flatten
                      order to flax's (H, W, C)
* ``BatchNorm2d``     weight/bias -> scale/bias params; running stats ->
                      batch_stats mean/var
* ``spectral_norm``   the effective weight ``weight_orig / sigma`` is
                      materialized with a converged power iteration
                      seeded from the stored ``weight_u``; flax's own
                      power iteration then fixes on sigma ~ 1, leaving
                      the effective weight unchanged

Each ``import_*`` returns a flax variables dict ``{"params": ...,
"batch_stats": ...}`` matching the corresponding
:mod:`eadgan_tpu.models` module, ready for ``ModelVars.create`` /
``save_model``.  State-dict key names follow the reference module
definitions (e.g. dSprites/rp.py:61-194 Sequential indices).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = [
    "converge_sn_state",
    "import_approximator",
    "import_mnist_generator",
    "import_mnist_encoder",
    "import_mnist_discriminator",
    "import_sprites_encoder_pxy",
    "import_sprites_generator",
    "import_sprites_discriminator",
    "import_sprites_encoder",
    "import_celeba_generator",
    "import_celeba_discriminator",
    "load_torch_state_dict",
]


def converge_sn_state(model, variables: dict, *dummy_inputs, iters: int = 200) -> dict:
    """Converge flax's spectral-norm power iteration on imported kernels.

    Imported SN kernels are pre-normalized (sigma = 1), but flax divides
    by its own sigma estimate from a freshly-initialized u vector, which
    needs iterations to converge (u updates depend only on the kernel,
    not the input).  Run after any ``import_*`` whose model has SN
    layers; returns variables with converged ``batch_stats``.

    ``iters`` default: power iteration converges at rate (s2/s1)^k, so
    kernels whose top two singular values are close need many rounds —
    30 left seed-dependent sigma errors that surfaced as ~2-3e-3 output
    deviations in the import parity tests (an order-dependent flake
    when torch's global RNG picked an ill-conditioned init); 200 drives
    the worst observed deviation to ~3e-4 at negligible one-time cost.
    """
    if "batch_stats" not in variables:
        import jax

        init = model.init(jax.random.PRNGKey(0), *dummy_inputs)
        if "batch_stats" not in init:
            return variables
        variables = dict(variables)
        variables["batch_stats"] = init["batch_stats"]
    else:
        # merge any missing SN state from a fresh init (imports carry BN
        # stats but not SN u/sigma)
        import jax

        init = model.init(jax.random.PRNGKey(0), *dummy_inputs)
        merged = dict(init.get("batch_stats", {}))
        merged.update(variables["batch_stats"])
        variables = dict(variables)
        variables["batch_stats"] = merged
    def has_sn(tree) -> bool:
        if isinstance(tree, dict):
            return any("SpectralNorm" in str(k) or has_sn(v) for k, v in tree.items())
        return False

    if not has_sn(variables["batch_stats"]):
        return variables  # nothing to converge (e.g. generators)

    import jax

    @jax.jit
    def apply_once(v):
        _, upd = model.apply(v, *dummy_inputs, train=True, mutable=["batch_stats"])
        return upd["batch_stats"]

    for _ in range(iters):
        upd = apply_once(variables)
        stats = dict(variables["batch_stats"])
        for k, v in upd.items():
            # keep imported BN running stats; only SN state converges
            if "SpectralNorm" in str(k) or has_sn(v):
                stats[k] = v
        variables["batch_stats"] = stats
    return variables


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a torch checkpoint to plain numpy (torch required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def _np(sd, key):
    v = sd[key]
    return v if isinstance(v, np.ndarray) else v.numpy()


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convT_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def nchw_flatten_perm(c: int, h: int, w: int) -> np.ndarray:
    """Row permutation for linears that consume a flattened conv map.

    Returns ``p`` with ``p[flax_idx] = torch_idx``, so
    ``K_flax = W_torch.T[p]`` places torch's (C, H, W)-ordered input
    rows at flax's (H, W, C) positions (numerically verified in
    tests/test_torch_import.py).
    """
    perm = np.empty(c * h * w, np.int64)
    for ci in range(c):
        for hi in range(h):
            for wi in range(w):
                flax_idx = hi * w * c + wi * c + ci
                torch_idx = ci * h * w + hi * w + wi
                perm[flax_idx] = torch_idx
    return perm


def linear_kernel(w: np.ndarray, flatten_chw: Optional[tuple] = None) -> np.ndarray:
    k = w.T  # (in, out)
    if flatten_chw is not None:
        c, h, ww = flatten_chw
        k = k[nchw_flatten_perm(c, h, ww)]
    return np.ascontiguousarray(k)


def sn_effective(
    w: np.ndarray, u: Optional[np.ndarray], v: Optional[np.ndarray] = None
) -> np.ndarray:
    """torch spectral_norm's effective weight W / sigma over W viewed as
    (out, -1).

    With the checkpoint's stored ``weight_u`` AND ``weight_v``, sigma is
    ``u . W v`` with no iteration — exactly the cached weight torch's
    eval-mode forward uses.  With only u, one torch-style power
    iteration; with neither, iterate to convergence from a fixed seed.
    """
    mat = w.reshape(w.shape[0], -1).astype(np.float64)
    eps = 1e-12
    if u is not None and v is not None:
        u_vec = np.asarray(u, np.float64).reshape(-1)
        v_vec = np.asarray(v, np.float64).reshape(-1)
        sigma = float(u_vec @ mat @ v_vec)
        return (w / sigma).astype(np.float32)
    if u is None:
        rng = np.random.default_rng(0)
        u_vec = rng.normal(size=mat.shape[0])
        n_iter = 50
    else:
        u_vec = np.asarray(u, np.float64).reshape(-1)
        n_iter = 1
    for _ in range(n_iter):
        v_vec = mat.T @ u_vec
        v_vec /= np.linalg.norm(v_vec) + eps
        u_vec = mat @ v_vec
        u_vec /= np.linalg.norm(u_vec) + eps
    sigma = float(u_vec @ mat @ v_vec)
    return (w / sigma).astype(np.float32)


def _bn(sd, prefix):
    params = {
        "scale": _np(sd, f"{prefix}.weight"),
        "bias": _np(sd, f"{prefix}.bias"),
    }
    stats = {
        "mean": _np(sd, f"{prefix}.running_mean"),
        "var": _np(sd, f"{prefix}.running_var"),
    }
    return params, stats


def _conv(sd, prefix, sn=False):
    if sn:
        w = sn_effective(
            _np(sd, f"{prefix}.weight_orig"),
            sd.get(f"{prefix}.weight_u"),
            sd.get(f"{prefix}.weight_v"),
        )
    else:
        w = _np(sd, f"{prefix}.weight")
    return {"kernel": conv_kernel(w), "bias": _np(sd, f"{prefix}.bias")}


def _convT(sd, prefix):
    return {
        "kernel": convT_kernel(_np(sd, f"{prefix}.weight")),
        "bias": _np(sd, f"{prefix}.bias"),
    }


def _dense(sd, prefix, sn=False, flatten_chw=None):
    if sn:
        w = sn_effective(
            _np(sd, f"{prefix}.weight_orig"),
            sd.get(f"{prefix}.weight_u"),
            sd.get(f"{prefix}.weight_v"),
        )
    else:
        w = _np(sd, f"{prefix}.weight")
    return {
        "kernel": linear_kernel(w, flatten_chw),
        "bias": _np(sd, f"{prefix}.bias"),
    }


def _wrap(inner, name):
    """Wrap a leaf layer dict under the flax wrapper module name."""
    return {name: inner}


# ---------------------------------------------------------------------------
# dSprites family (dSprites/pxy.py:54-80, dSprites/rp.py:61-194;
# colored variants share the structure with 3 channels / wider heads)
# ---------------------------------------------------------------------------


def import_sprites_encoder_pxy(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"TorchConv_{i}"] = _wrap(_conv(sd, f"conv_block.{seq}"), "Conv_0")
    params["TorchDense_0"] = _wrap(
        _dense(sd, "fc1", flatten_chw=(64, 4, 4)), "Dense_0"
    )
    return {"params": params}


def import_sprites_discriminator(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"conv_block.{seq}", sn=True), "Conv_0")
    params["SNDense_0"] = _wrap(
        _dense(sd, "fc1.0", sn=True, flatten_chw=(64, 4, 4)), "Dense_0"
    )
    params["TorchDense_0"] = _wrap(_dense(sd, "fc2"), "Dense_0")
    return {"params": params}


def import_sprites_generator(sd) -> dict:
    params = {
        "TorchDense_0": _wrap(_dense(sd, "fc1.0"), "Dense_0"),
        "TorchDense_1": _wrap(_dense(sd, "fc2.0"), "Dense_0"),
    }
    stats = {}
    for i, seq in enumerate((0, 3, 6)):
        params[f"TorchConvTranspose_{i}"] = _wrap(
            _convT(sd, f"conv_block.{seq}"), "ConvTranspose_0"
        )
        bn_p, bn_s = _bn(sd, f"conv_block.{seq + 1}")
        params[f"TorchBatchNorm_{i}"] = _wrap(bn_p, "BatchNorm_0")
        stats[f"TorchBatchNorm_{i}"] = _wrap(bn_s, "BatchNorm_0")
    params["TorchConvTranspose_3"] = _wrap(_convT(sd, "conv_block.9"), "ConvTranspose_0")
    return {"params": params, "batch_stats": stats}


def import_sprites_encoder(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"conv_block.{seq}", sn=True), "Conv_0")
    params["SNDense_0"] = _wrap(
        _dense(sd, "fc1.0", sn=True, flatten_chw=(64, 4, 4)), "Dense_0"
    )
    params["SNDense_1"] = _wrap(_dense(sd, "fc2.0", sn=True), "Dense_0")
    params["SNDense_2"] = _wrap(_dense(sd, "cat_layer.0", sn=True), "Dense_0")
    params["SNDense_3"] = _wrap(_dense(sd, "cont_layer.0", sn=True), "Dense_0")
    return {"params": params}


# ---------------------------------------------------------------------------
# MNIST family (MNIST/EAD-GAN_rpqmnxy.py:71-175,
# MNIST/approximate_rpqmnxy.py:20-42)
# ---------------------------------------------------------------------------


def import_mnist_generator(sd) -> dict:
    params = {"TorchDense_0": _wrap(_dense(sd, "l1.0"), "Dense_0")}
    stats = {}
    bn_p, bn_s = _bn(sd, "conv_blocks.0")
    params["TorchBatchNorm_0"] = _wrap(bn_p, "BatchNorm_0")
    stats["TorchBatchNorm_0"] = _wrap(bn_s, "BatchNorm_0")
    for i, (conv_seq, bn_seq) in enumerate(((2, 3), (6, 7))):
        params[f"TorchConv_{i}"] = _wrap(_conv(sd, f"conv_blocks.{conv_seq}"), "Conv_0")
        bn_p, bn_s = _bn(sd, f"conv_blocks.{bn_seq}")
        params[f"TorchBatchNorm_{i + 1}"] = _wrap(bn_p, "BatchNorm_0")
        stats[f"TorchBatchNorm_{i + 1}"] = _wrap(bn_s, "BatchNorm_0")
    params["TorchConv_2"] = _wrap(_conv(sd, "conv_blocks.9"), "Conv_0")
    return {"params": params, "batch_stats": stats}


def import_mnist_encoder(sd, img_size: int = 32) -> dict:
    # encoder_block indices: (0,), (2, bn 4), (5, bn 7), (8, bn 10)
    params = {}
    stats = {}
    for i, seq in enumerate((0, 2, 5, 8)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"conv_blocks.{seq}", sn=True), "Conv_0")
    for i, seq in enumerate((4, 7, 10)):
        bn_p, bn_s = _bn(sd, f"conv_blocks.{seq}")
        params[f"TorchBatchNorm_{i}"] = _wrap(bn_p, "BatchNorm_0")
        stats[f"TorchBatchNorm_{i}"] = _wrap(bn_s, "BatchNorm_0")
    ds = img_size // 16
    flat = (128, ds, ds)
    params["SNDense_0"] = _wrap(_dense(sd, "aux_layer.0", sn=True, flatten_chw=flat), "Dense_0")
    params["SNDense_1"] = _wrap(_dense(sd, "latent_layer.0", sn=True, flatten_chw=flat), "Dense_0")
    params["SNDense_2"] = _wrap(_dense(sd, "noise_layer.0", sn=True, flatten_chw=flat), "Dense_0")
    return {"params": params, "batch_stats": stats}


def import_mnist_discriminator(sd, img_size: int = 32) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"conv_blocks.{seq}", sn=True), "Conv_0")
    ds = img_size // 16
    params["SNDense_0"] = _wrap(
        _dense(sd, "adv_layer.0", sn=True, flatten_chw=(128, ds, ds)), "Dense_0"
    )
    return {"params": params}


def import_approximator(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6, 8)):
        params[f"TorchDense_{i}"] = _wrap(_dense(sd, f"fc_block.{seq}"), "Dense_0")
    return {"params": params}


# ---------------------------------------------------------------------------
# CelebA family (celebA/EAD-GAN_celebA.py:67-138; checkpoint_%d.tar holds
# {'generator_state_dict', 'discriminator_state_dict', ...})
# ---------------------------------------------------------------------------


def import_celeba_generator(sd) -> dict:
    params = {}
    stats = {}
    convs = (0, 1, 4, 7, 10)
    bns = (2, 5, 8)
    for i, seq in enumerate(convs):
        params[f"TorchConvTranspose_{i}"] = _wrap(
            _convT(sd, f"conv_blocks.{seq}"), "ConvTranspose_0"
        )
    for i, seq in enumerate(bns):
        bn_p, bn_s = _bn(sd, f"conv_blocks.{seq}")
        params[f"TorchBatchNorm_{i}"] = _wrap(bn_p, "BatchNorm_0")
        stats[f"TorchBatchNorm_{i}"] = _wrap(bn_s, "BatchNorm_0")
    return {"params": params, "batch_stats": stats}


def import_celeba_discriminator(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"main.{seq}", sn=True), "Conv_0")
    params["TorchConv_0"] = _wrap(_conv(sd, "main.8"), "Conv_0")
    return {"params": params}
