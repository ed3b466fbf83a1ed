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
                      materialized with torch's stored-uv eval sigma,
                      and flax's power-iteration state is set to the
                      unit-sigma solution (see ``_sn_u0_unit_sigma``)
                      so flax's own eval-time division is exactly 1.
                      Do NOT re-converge: at the SN equilibrium of
                      long-trained layers (all singular values ~1) a
                      converged iteration finds s1 != u'Wv and each
                      layer's effective weight skews ~1e-3 relative,
                      compounding to percent-level head outputs

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

    Variables whose batch_stats ALREADY carry SpectralNorm state (every
    ``import_*`` seeds it from torch's stored ``weight_u`` since round
    3) are returned after the fresh-init merge WITHOUT iterating:
    torch's eval sigma is its stored-uv Rayleigh quotient, and at the SN
    equilibrium of long-trained kernels (all singular values ~1) a
    converged iteration would move sigma to s1 != u'Wv, skewing the
    effective weight ~1e-3 relative against the torch consumer.
    """
    def has_sn(tree) -> bool:
        if isinstance(tree, dict):
            return any("SpectralNorm" in str(k) or has_sn(v) for k, v in tree.items())
        return False

    seeded = has_sn(variables.get("batch_stats", {}))
    if "batch_stats" not in variables:
        import jax

        init = model.init(jax.random.PRNGKey(0), *dummy_inputs)
        if "batch_stats" not in init:
            return variables
        variables = dict(variables)
        variables["batch_stats"] = init["batch_stats"]
    else:
        # merge any missing SN state from a fresh init (imports carry BN
        # stats and torch-seeded SN u/sigma; fill anything else)
        import jax

        init = model.init(jax.random.PRNGKey(0), *dummy_inputs)
        merged = dict(init.get("batch_stats", {}))
        merged.update(variables["batch_stats"])
        variables = dict(variables)
        variables["batch_stats"] = merged

    if seeded or not has_sn(variables["batch_stats"]):
        return variables  # torch-seeded u (keep it), or nothing to converge

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


def _sn_u0_unit_sigma(kernel: np.ndarray) -> np.ndarray:
    """flax ``u0`` state that makes flax's eval sigma EXACTLY 1 on a
    pre-normalized imported kernel.

    The imported kernel is already torch's exact eval-time effective
    weight (W_orig / (u'Wv)), so the correct flax division is by 1.
    flax's SpectralNorm recomputes sigma at every apply with one power
    step from the stored u0: ``v0 = normalize(u0 K^T); sigma = |v0 K|``.
    Converging u0 (the pre-round-3 approach) lands sigma on s1(K) =
    s1(W)/(u'Wv) instead — and on long-trained layers the spectrum sits
    at the SN equilibrium (ALL singular values ~1, s1 != u'Wv), so every
    SN layer's effective weight skews ~1e-3 relative and the error
    compounds through the 8-layer encoders into percent-level head
    outputs (measured on 500k-step colored encoders, ROUND_NOTES r3).

    Instead solve for sigma = 1 exactly: with K = U S V^T, a mixture
    ``u0 = cos/S_i * V_i + sin/S_j * V_j`` gives ``v0 = cos*U_i +
    sin*U_j`` (unit) and ``sigma = sqrt(cos^2 S_i^2 + sin^2 S_j^2)``;
    choosing cos^2 = (1 - S_j^2)/(S_i^2 - S_j^2) for S_j <= 1 <= S_i
    pins sigma to 1 to f32 rounding.  S_i >= 1 always holds on a
    pre-normalized kernel (Rayleigh <= s1); when every S > 1 or the
    usable S_j is degenerate, fall back to the closest achievable
    vector (residual |S-1| ~ rounding in practice).
    """
    mat = kernel.reshape(-1, kernel.shape[-1]).astype(np.float64)
    u_mat, s, vt = np.linalg.svd(mat, full_matrices=False)
    del u_mat
    if s[0] <= 1.0:  # sigma range tops out below 1: top vector is closest
        u0 = vt[0]
    else:
        below = [j for j in range(len(s)) if s[j] <= 1.0 and s[j] > 1e-6]
        if not below:
            u0 = vt[-1] if s[-1] > 1.0 else vt[0]
        else:
            j = below[0]  # largest singular value <= 1 (s is descending)
            c2 = (1.0 - s[j] ** 2) / (s[0] ** 2 - s[j] ** 2)
            c2 = min(max(c2, 0.0), 1.0)
            cos, sin = np.sqrt(c2), np.sqrt(1.0 - c2)
            u0 = (cos / s[0]) * vt[0] + (sin / s[j]) * vt[j]
            u0 = u0 / (np.linalg.norm(u0) + 1e-300)
    return u0.reshape(1, -1).astype(np.float32)


def _conv(sd, prefix, sn=False):
    if sn:
        w = sn_effective(
            _np(sd, f"{prefix}.weight_orig"),
            sd.get(f"{prefix}.weight_u"),
            sd.get(f"{prefix}.weight_v"),
        )
        k = conv_kernel(w)
        return {"kernel": k, "bias": _np(sd, f"{prefix}.bias"),
                "__sn_u__": _sn_u0_unit_sigma(k)}
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
        k = linear_kernel(w, flatten_chw)
        return {"kernel": k, "bias": _np(sd, f"{prefix}.bias"),
                "__sn_u__": _sn_u0_unit_sigma(k)}
    w = _np(sd, f"{prefix}.weight")
    return {
        "kernel": linear_kernel(w, flatten_chw),
        "bias": _np(sd, f"{prefix}.bias"),
    }


def _wrap(inner, name):
    """Wrap a leaf layer dict under the flax wrapper module name."""
    return {name: inner}


def _with_sn_stats(tree: dict) -> dict:
    """Strip the ``__sn_u__`` markers the SN layer helpers attach and
    return complete flax variables: ``{"params": ..., "batch_stats": ...}``
    with the spectral-norm state seeded from torch's stored vectors
    (flax naming: ``<mod>/SpectralNorm_0/{"<inner>/kernel/u", ".../sigma"}``;
    sigma is write-only in flax — stored as torch's eval value, 1.0, since
    the kernels are pre-normalized)."""
    params = tree["params"]
    stats = dict(tree.get("batch_stats", {}))
    for mod, sub in params.items():
        for inner, leaf in sub.items() if isinstance(sub, dict) else ():
            if isinstance(leaf, dict) and "__sn_u__" in leaf:
                u = leaf.pop("__sn_u__")
                stats[mod] = {
                    "SpectralNorm_0": {
                        f"{inner}/kernel/u": u,
                        f"{inner}/kernel/sigma": np.float32(1.0),
                    }
                }
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


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
    return _with_sn_stats({"params": params})


def import_sprites_discriminator(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"conv_block.{seq}", sn=True), "Conv_0")
    params["SNDense_0"] = _wrap(
        _dense(sd, "fc1.0", sn=True, flatten_chw=(64, 4, 4)), "Dense_0"
    )
    params["TorchDense_0"] = _wrap(_dense(sd, "fc2"), "Dense_0")
    return _with_sn_stats({"params": params})


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
    return _with_sn_stats({"params": params, "batch_stats": stats})


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
    return _with_sn_stats({"params": params})


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
    return _with_sn_stats({"params": params, "batch_stats": stats})


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
    return _with_sn_stats({"params": params, "batch_stats": stats})


def import_mnist_discriminator(sd, img_size: int = 32) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"conv_blocks.{seq}", sn=True), "Conv_0")
    ds = img_size // 16
    params["SNDense_0"] = _wrap(
        _dense(sd, "adv_layer.0", sn=True, flatten_chw=(128, ds, ds)), "Dense_0"
    )
    return _with_sn_stats({"params": params})


def import_approximator(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6, 8)):
        params[f"TorchDense_{i}"] = _wrap(_dense(sd, f"fc_block.{seq}"), "Dense_0")
    return _with_sn_stats({"params": params})


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
    return _with_sn_stats({"params": params, "batch_stats": stats})


def import_celeba_discriminator(sd) -> dict:
    params = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        params[f"SNConv_{i}"] = _wrap(_conv(sd, f"main.{seq}", sn=True), "Conv_0")
    params["TorchConv_0"] = _wrap(_conv(sd, "main.8"), "Conv_0")
    return _with_sn_stats({"params": params})
