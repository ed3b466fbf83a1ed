"""Export flax parameter trees back to reference PyTorch state_dicts.

The exact inverse of :mod:`eadgan_tpu.interop.torch_import` — every
layout mapping documented there is inverted here, so the reference's own
consumers (``MNIST/generate_image.py:146-152``, ``celebA/gen_imgs.py:
106-114``, ``dSprites/score/BetVAE.py:193-205``) can load weights
trained by this framework.

Spectral-norm layers: torch's eval-mode forward computes
``weight = weight_orig / (u . W v)`` from the stored ``weight_u`` /
``weight_v`` buffers with no power iteration.  We export
``weight_orig = W_eff`` (the effective weight flax's forward actually
uses, i.e. raw kernel divided by flax's one-power-step sigma from the
stored ``u``) together with ``weight_u`` = its top left-singular vector
and ``weight_v`` scaled by ``1/sigma(W_eff)`` so torch's eval sigma is
exactly 1 and the forward weight is exactly ``W_eff``.  (A later
train-mode power iteration on the torch side re-normalizes ``v`` and
lands on the true sigma of ``W_eff`` ~= 1, so fine-tuning from an export
is also well behaved.)

Each ``export_*`` takes the flax variables dict (``{"params": ...,
"batch_stats": ...}``) and returns ``{torch_key: np.ndarray}`` (plus
int64 scalars for BN ``num_batches_tracked``), ready for
``save_torch_state_dict``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from eadgan_tpu.interop.torch_import import nchw_flatten_perm

__all__ = [
    "export_approximator",
    "export_mnist_generator",
    "export_mnist_encoder",
    "export_mnist_discriminator",
    "export_sprites_encoder_pxy",
    "export_sprites_generator",
    "export_sprites_discriminator",
    "export_sprites_encoder",
    "export_celeba_generator",
    "export_celeba_discriminator",
    "save_torch_state_dict",
]


def save_torch_state_dict(path: str, sd: Dict[str, np.ndarray]) -> None:
    """Write a torch-loadable checkpoint (torch required)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)


# --- layout inverses (see torch_import for the forward direction) --------


def conv_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax (kh, kw, in, out) -> torch Conv2d (out, in, kh, kw)."""
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def convT_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax (kh, kw, in, out), taps flipped -> torch ConvTranspose2d
    (in, out, kh, kw)."""
    return np.ascontiguousarray(np.transpose(k[::-1, ::-1], (2, 3, 0, 1)))


def linear_kernel_inv(k: np.ndarray, flatten_chw: Optional[tuple] = None) -> np.ndarray:
    """flax (in, out) -> torch Linear (out, in), undoing the (H, W, C) ->
    (C, H, W) flatten-order row permutation when present."""
    if flatten_chw is not None:
        c, h, w = flatten_chw
        k = k[np.argsort(nchw_flatten_perm(c, h, w))]
    return np.ascontiguousarray(k.T)


def _l2n(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    return x / np.sqrt(np.sum(x * x) + eps)


def flax_sn_effective(kernel: np.ndarray, u: Optional[np.ndarray]) -> np.ndarray:
    """The effective weight flax's SpectralNorm forward produces: one
    power-iteration step from the stored ``u`` on the kernel viewed as
    (-1, out), then divide by that sigma (mirrors
    flax.linen.SpectralNorm._spectral_normalize)."""
    mat = kernel.reshape(-1, kernel.shape[-1]).astype(np.float64)
    if u is None:
        # unconverged fresh state: iterate to the stationary point
        rng = np.random.default_rng(0)
        u_vec = _l2n(rng.normal(size=(1, mat.shape[1])))
        steps = 100
    else:
        u_vec = np.asarray(u, np.float64).reshape(1, -1)
        steps = 1
    for _ in range(steps):
        v_vec = _l2n(u_vec @ mat.T)
        u_vec = _l2n(v_vec @ mat)
    sigma = ((v_vec @ mat) @ u_vec.T).item()
    return (kernel / (sigma if sigma != 0 else 1.0)).astype(np.float32)


def torch_sn_uv(w_torch: np.ndarray) -> tuple:
    """``(weight_u, weight_v)`` buffers making torch's eval-mode sigma
    exactly 1 for ``weight_orig = w_torch`` (see module docstring)."""
    mat = w_torch.reshape(w_torch.shape[0], -1).astype(np.float64)
    rng = np.random.default_rng(0)
    u = _l2n(rng.normal(size=mat.shape[0]))
    for _ in range(200):
        v = _l2n(mat.T @ u)
        u = _l2n(mat @ v)
    sigma = float(u @ mat @ v)
    return u.astype(np.float32), (v / sigma).astype(np.float32)


# --- per-layer exporters ---------------------------------------------------


def _p(variables, *path):
    node = variables["params"]
    for k in path:
        node = node[k]
    return node


def _sn_u(variables, module, inner):
    stats = variables.get("batch_stats", {})
    try:
        return np.asarray(stats[module]["SpectralNorm_0"][f"{inner}/kernel/u"])
    except KeyError:
        return None


def _conv_out(sd, torch_prefix, variables, module, sn=False, transpose=False):
    leaf = _p(variables, module, "ConvTranspose_0" if transpose else "Conv_0")
    kernel = np.asarray(leaf["kernel"], np.float32)
    bias = np.asarray(leaf["bias"], np.float32)
    if sn:
        w_eff = conv_kernel_inv(
            flax_sn_effective(kernel, _sn_u(variables, module, "Conv_0"))
        )
        u, v = torch_sn_uv(w_eff)
        sd[f"{torch_prefix}.weight_orig"] = w_eff
        sd[f"{torch_prefix}.weight_u"] = u
        sd[f"{torch_prefix}.weight_v"] = v
    else:
        sd[f"{torch_prefix}.weight"] = (
            convT_kernel_inv(kernel) if transpose else conv_kernel_inv(kernel)
        )
    sd[f"{torch_prefix}.bias"] = bias


def _dense_out(sd, torch_prefix, variables, module, sn=False, flatten_chw=None):
    leaf = _p(variables, module, "Dense_0")
    kernel = np.asarray(leaf["kernel"], np.float32)
    bias = np.asarray(leaf["bias"], np.float32)
    if sn:
        w_eff = linear_kernel_inv(
            flax_sn_effective(kernel, _sn_u(variables, module, "Dense_0")),
            flatten_chw,
        )
        u, v = torch_sn_uv(w_eff)
        sd[f"{torch_prefix}.weight_orig"] = w_eff
        sd[f"{torch_prefix}.weight_u"] = u
        sd[f"{torch_prefix}.weight_v"] = v
    else:
        sd[f"{torch_prefix}.weight"] = linear_kernel_inv(kernel, flatten_chw)
    sd[f"{torch_prefix}.bias"] = bias


def _bn_out(sd, torch_prefix, variables, module):
    leaf = _p(variables, module, "BatchNorm_0")
    stats = variables["batch_stats"][module]["BatchNorm_0"]
    sd[f"{torch_prefix}.weight"] = np.asarray(leaf["scale"], np.float32)
    sd[f"{torch_prefix}.bias"] = np.asarray(leaf["bias"], np.float32)
    sd[f"{torch_prefix}.running_mean"] = np.asarray(stats["mean"], np.float32)
    sd[f"{torch_prefix}.running_var"] = np.asarray(stats["var"], np.float32)
    sd[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


# ---------------------------------------------------------------------------
# dSprites family (inverse of import_sprites_*)
# ---------------------------------------------------------------------------


def export_sprites_encoder_pxy(variables) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        _conv_out(sd, f"conv_block.{seq}", variables, f"TorchConv_{i}")
    _dense_out(sd, "fc1", variables, "TorchDense_0", flatten_chw=(64, 4, 4))
    return sd


def export_sprites_discriminator(variables) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        _conv_out(sd, f"conv_block.{seq}", variables, f"SNConv_{i}", sn=True)
    _dense_out(sd, "fc1.0", variables, "SNDense_0", sn=True, flatten_chw=(64, 4, 4))
    _dense_out(sd, "fc2", variables, "TorchDense_0")
    return sd


def export_sprites_generator(variables) -> dict:
    sd: dict = {}
    _dense_out(sd, "fc1.0", variables, "TorchDense_0")
    _dense_out(sd, "fc2.0", variables, "TorchDense_1")
    for i, seq in enumerate((0, 3, 6)):
        _conv_out(sd, f"conv_block.{seq}", variables, f"TorchConvTranspose_{i}", transpose=True)
        _bn_out(sd, f"conv_block.{seq + 1}", variables, f"TorchBatchNorm_{i}")
    _conv_out(sd, "conv_block.9", variables, "TorchConvTranspose_3", transpose=True)
    return sd


def export_sprites_encoder(variables) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        _conv_out(sd, f"conv_block.{seq}", variables, f"SNConv_{i}", sn=True)
    _dense_out(sd, "fc1.0", variables, "SNDense_0", sn=True, flatten_chw=(64, 4, 4))
    _dense_out(sd, "fc2.0", variables, "SNDense_1", sn=True)
    _dense_out(sd, "cat_layer.0", variables, "SNDense_2", sn=True)
    _dense_out(sd, "cont_layer.0", variables, "SNDense_3", sn=True)
    return sd


# ---------------------------------------------------------------------------
# MNIST family (inverse of import_mnist_*)
# ---------------------------------------------------------------------------


def export_mnist_generator(variables) -> dict:
    sd: dict = {}
    _dense_out(sd, "l1.0", variables, "TorchDense_0")
    _bn_out(sd, "conv_blocks.0", variables, "TorchBatchNorm_0")
    for i, (conv_seq, bn_seq) in enumerate(((2, 3), (6, 7))):
        _conv_out(sd, f"conv_blocks.{conv_seq}", variables, f"TorchConv_{i}")
        _bn_out(sd, f"conv_blocks.{bn_seq}", variables, f"TorchBatchNorm_{i + 1}")
    _conv_out(sd, "conv_blocks.9", variables, "TorchConv_2")
    return sd


def export_mnist_encoder(variables, img_size: int = 32) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 5, 8)):
        _conv_out(sd, f"conv_blocks.{seq}", variables, f"SNConv_{i}", sn=True)
    for i, seq in enumerate((4, 7, 10)):
        _bn_out(sd, f"conv_blocks.{seq}", variables, f"TorchBatchNorm_{i}")
    ds = img_size // 16
    flat = (128, ds, ds)
    _dense_out(sd, "aux_layer.0", variables, "SNDense_0", sn=True, flatten_chw=flat)
    _dense_out(sd, "latent_layer.0", variables, "SNDense_1", sn=True, flatten_chw=flat)
    _dense_out(sd, "noise_layer.0", variables, "SNDense_2", sn=True, flatten_chw=flat)
    return sd


def export_mnist_discriminator(variables, img_size: int = 32) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        _conv_out(sd, f"conv_blocks.{seq}", variables, f"SNConv_{i}", sn=True)
    ds = img_size // 16
    _dense_out(sd, "adv_layer.0", variables, "SNDense_0", sn=True, flatten_chw=(128, ds, ds))
    return sd


def export_approximator(variables) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 4, 6, 8)):
        _dense_out(sd, f"fc_block.{seq}", variables, f"TorchDense_{i}")
    return sd


# ---------------------------------------------------------------------------
# CelebA family (inverse of import_celeba_*)
# ---------------------------------------------------------------------------


def export_celeba_generator(variables) -> dict:
    sd: dict = {}
    convs = (0, 1, 4, 7, 10)
    bns = (2, 5, 8)
    for i, seq in enumerate(convs):
        _conv_out(sd, f"conv_blocks.{seq}", variables, f"TorchConvTranspose_{i}", transpose=True)
    for i, seq in enumerate(bns):
        _bn_out(sd, f"conv_blocks.{seq}", variables, f"TorchBatchNorm_{i}")
    return sd


def export_celeba_discriminator(variables) -> dict:
    sd: dict = {}
    for i, seq in enumerate((0, 2, 4, 6)):
        _conv_out(sd, f"main.{seq}", variables, f"SNConv_{i}", sn=True)
    _conv_out(sd, "main.8", variables, "TorchConv_0")
    return sd
