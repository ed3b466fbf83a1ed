"""Post-training int8 quantization for CelebA generator inference.

The reference has no quantized path — its inference consumer is plain
f32 torch (celebA/gen_imgs.py:106-140).  This module is a TPU-native
extension.  The three stride-2 mid layers carry ~99% of the forward
FLOPs (134 MMAC each vs 3.6 + 6.3 MMAC for the ends), so only they are
quantized; the first layer (establishes the latent->feature
distribution) and the last (feeds tanh directly) stay in bf16 for
output fidelity.

**Measured outcome (v5e, batch 128 — tools/quant_bench.py): int8 is a
perf NEGATIVE on this chip, kept for memory, not speed.**  An isolated
probe of the dominant ConvTranspose shape (k4 s2, 512->256 at 16x16)
showed int8 0.897 ms vs bf16 1.362 ms = 1.52x (tools/int8_probe.py) —
but the ceiling it reveals is the real story: XLA's int8 convT lowering
tops out at ~153 TOPS, BELOW the 143 TF/s the full bf16 forward already
sustains (73% of the 197 TF/s bf16 peak; the datasheet's 394 TOPS int8
never materializes through this lowering).  End to end: exact bf16
0.734 ms/batch, int8 0.758 ms (0.97x), at 64.2 dB output PSNR.  The
isolated probe's win came from its bf16 baseline underperforming the
full graph's (101 vs 143 TF/s), not from int8 exceeding it.  Do not
re-attempt speed-motivated int8 here without evidence the lowering
reaches >200 TOPS; the path stays supported because int8 weights cut
the dominant layers' weight memory 4x vs f32 (serving density) at
negligible fidelity cost.

Scheme (standard post-training quantization, no calibration needed):

- eval-mode BatchNorm folds into the preceding ConvTranspose exactly:
  ``y = g*(conv(x)+b-mu)/sqrt(var+eps) + beta`` becomes a conv with
  kernel ``k*s`` and bias ``(b-mu)*s+beta`` where ``s = g/sqrt(var+eps)``
  broadcasts over the output-channel dim.  Folding is lossless in f32
  and removes the BN normalize pass from the inference graph entirely.
- weights: symmetric per-output-channel int8 (scale = amax/127 over
  the (kh, kw, in) reduction axes) — the per-channel scale rides the
  conv epilogue as a length-C_out broadcast multiply.
- activations: dynamic symmetric per-tensor int8 (scale from the
  tensor's own abs-max, computed in-graph per batch).  No calibration
  set exists in this workflow (the consumer renders from arbitrary
  latent sweeps), so dynamic quant is the honest choice; the reduction
  is one small fused pass over an activation XLA is already streaming.
- accumulation in int32 (``preferred_element_type``), dequantized by
  the fused scalar*per-channel epilogue, bias added in f32, ReLU, and
  re-quantized at the next layer boundary.

The int8 convs use the exact ``lax.conv_general_dilated`` formulation
flax's ``nn.ConvTranspose`` lowers to (window_strides=1, explicit
padding k-1-p per side, ``lhs_dilation=strides``) so the f32/bf16 and
int8 paths share geometry bit-for-bit; ``tests/test_quant.py`` pins the
unquantized fold against ``CelebaGenerator.apply(train=False)`` and the
int8 path against an f32-reference PSNR bar.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "fold_celeba_generator_bn",
    "quantize_kernel_per_channel",
    "make_celeba_infer",
]

# (strides, torch padding) per ConvTranspose layer of CelebaGenerator;
# kernel is 4x4 everywhere (models/celeba.py:38-43).
_LAYER_GEOM = ((1, 0), (2, 1), (2, 1), (2, 1), (2, 1))
_QUANTIZED_LAYERS = (1, 2, 3)  # the stride-2 FLOPs carriers


def fold_celeba_generator_bn(variables, eps: float = 1e-5):
    """Fold eval-mode BN into the ConvT weights of a CelebaGenerator.

    Returns a list of 5 dicts ``{"kernel", "bias"}`` (f32), one per
    ConvTranspose layer, with BN_0..2 folded into layers 1..3.  ``eps``
    must match the model's TorchBatchNorm eps (CelebA uses the 1e-5
    default, models/celeba.py:41).
    """
    p = variables["params"]
    s = variables.get("batch_stats", {})
    layers = []
    for i in range(5):
        ct = p[f"TorchConvTranspose_{i}"]["ConvTranspose_0"]
        kernel = jnp.asarray(ct["kernel"], jnp.float32)
        bias = jnp.asarray(ct["bias"], jnp.float32)
        if i in _QUANTIZED_LAYERS:
            bn_p = p[f"TorchBatchNorm_{i - 1}"]["BatchNorm_0"]
            bn_s = s[f"TorchBatchNorm_{i - 1}"]["BatchNorm_0"]
            scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
            kernel = kernel * scale  # broadcasts over the out-channel dim
            bias = (bias - bn_s["mean"]) * scale + bn_p["bias"]
        layers.append({"kernel": kernel, "bias": bias})
    return layers


def quantize_kernel_per_channel(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8: (q, scale) with
    ``kernel ~= q * scale`` and scale shaped (C_out,)."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _convt(x, kernel, stride: int, torch_pad: int, ptype):
    """The flax nn.ConvTranspose lowering used by TorchConvTranspose
    (models/layers.py:99-110): explicit (k-1-p) padding on the
    stride-dilated input, window stride 1, HWIO kernel, no flip."""
    pad = kernel.shape[0] - 1 - torch_pad
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=ptype,
    )


def _quantize_activation(x):
    """Dynamic symmetric per-tensor int8; returns (q, scale)."""
    amax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def make_celeba_infer(
    variables,
    quant: str = "int8",
    compute_dtype: Any = jnp.bfloat16,
    eps: float = 1e-5,
) -> Any:
    """Build a jitted eval-mode CelebA generator forward.

    ``quant="int8"`` runs the three mid ConvT layers on the int8 MXU
    path; ``quant="none"`` runs the identical BN-folded graph in
    ``compute_dtype`` — used both as the folding-correctness oracle in
    tests and as a fast bf16 inference path with BN removed.

    Matches ``CelebaGenerator.apply(..., train=False)`` semantics
    (running-stat BN, the reference's generator.eval() before rendering,
    celebA/gen_imgs.py:114).
    """
    if quant not in ("int8", "none"):
        raise ValueError(f"unknown quant mode {quant!r}")
    folded = fold_celeba_generator_bn(variables, eps=eps)
    prepared = []
    for i, layer in enumerate(folded):
        if quant == "int8" and i in _QUANTIZED_LAYERS:
            q, w_scale = quantize_kernel_per_channel(layer["kernel"])
            prepared.append(
                {"kernel": q, "w_scale": w_scale, "bias": layer["bias"], "int8": True}
            )
        else:
            prepared.append(
                {
                    "kernel": layer["kernel"].astype(compute_dtype),
                    "bias": layer["bias"],
                    "int8": False,
                }
            )

    def fwd(z, labels, code):
        x = jnp.concatenate(
            [
                jnp.asarray(z, jnp.float32),
                jnp.asarray(labels, jnp.float32),
                jnp.asarray(code, jnp.float32),
            ],
            axis=-1,
        )[:, None, None, :]
        for i, layer in enumerate(prepared):
            stride, pad = _LAYER_GEOM[i]
            if layer["int8"]:
                xq, a_scale = _quantize_activation(x)
                y = _convt(xq, layer["kernel"], stride, pad, jnp.int32)
                x = y.astype(jnp.float32) * (a_scale * layer["w_scale"]) + layer["bias"]
            else:
                y = _convt(
                    x.astype(compute_dtype), layer["kernel"], stride, pad, jnp.float32
                )
                x = y + layer["bias"]
            if i in _QUANTIZED_LAYERS:  # BN already folded; ReLU remains
                x = jax.nn.relu(x)
        return jnp.tanh(x).astype(jnp.float32)

    return jax.jit(fwd)
