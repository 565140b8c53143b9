"""Int8 post-training quantization for the FOV-DSM serving path.

TPU v5e's MXU runs int8 at 2x the bf16 rate; for inference-heavy workloads
(gallery embedding, heatmap sweeps — the reference's tools/heatmap path) the
towers can run with int8 weights and activations:

- weights: symmetric per-output-channel int8 (scale = max|w| / 127),
- activations: symmetric per-tensor int8 with dynamic (per-batch) scales,
- convolutions accumulate in int32 (preferred_element_type), bias-add and
  ReLU in float32, requantize before the next conv,
- max-pooling commutes with the positive scale and runs on int8.

This is an optional serving path — training and parity evals stay bf16/f32.
Typical embedding agreement vs the f32 path: cosine > 0.99 (tested).

Measured on TPU v5e at CVUSA geometry (batch 128): the int8 path is NOT
faster end-to-end than bf16 (1410 vs 1750 pairs/s) — XLA's conv at these
shapes is layout/memory-bound, not MXU-rate-bound, and the per-layer dynamic
requantization adds elementwise passes. Kept for memory-constrained serving
(4x smaller weights, int8 activations) and as the basis for a future static-
scale variant.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from witw_tpu.models.backbones.vgg16 import (
    DROPOUT_CONVS,
    VGG16_BLOCKS,
    wrap_pad_width,
)
from witw_tpu.models.fov_dsm import HEAD_CONVS


def quantize_fov_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """FovDsm params -> int8 kernels + per-channel scales (+f32 biases)."""

    def quant_kernel(kernel: np.ndarray) -> Dict[str, np.ndarray]:
        k = np.asarray(kernel, np.float32)
        scale = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0  # per out-channel
        scale = np.maximum(scale, 1e-12)
        q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
        return {"kernel_q": q, "scale": scale.astype(np.float32)}

    out: Dict[str, Any] = {"vgg": {}}
    for name, kv in params["vgg"].items():
        out["vgg"][name] = dict(quant_kernel(kv["kernel"]), bias=np.asarray(kv["bias"], np.float32))
    for name, _, _, _ in HEAD_CONVS:
        kv = params[name]
        out[name] = dict(quant_kernel(kv["kernel"]), bias=np.asarray(kv["bias"], np.float32))
    return out


def _quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-tensor activation quantization."""
    scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _qconv(
    x_q: jnp.ndarray,
    x_scale: jnp.ndarray,
    qkv: Dict[str, jnp.ndarray],
    strides=(1, 1),
    pad_h=(1, 1),
    pad_w=(1, 1),
) -> jnp.ndarray:
    """int8 x int8 -> int32 conv, dequantized float32 output with bias."""
    acc = jax.lax.conv_general_dilated(
        x_q,
        qkv["kernel_q"],
        window_strides=strides,
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * qkv["scale"]) + qkv["bias"]


def quantized_fov_forward(
    qparams: Dict[str, Any], x: jnp.ndarray, circ_padding: bool = False
) -> jnp.ndarray:
    """Int8 forward of the FOV-DSM tower (inference only).

    x: normalized NHWC float input. Returns the float32 [B, h, w, 16]
    embedding map — same contract as FovDsm.__call__ (eval mode).
    """
    w_pad = (0, 0) if circ_padding else (1, 1)
    h = x.astype(jnp.float32)
    for block_i, block in enumerate(VGG16_BLOCKS):
        if circ_padding:
            h = wrap_pad_width(h, len(block))
        h_q, h_scale = _quantize_act(h)
        for torch_idx, _ in block:
            y = _qconv(h_q, h_scale, qparams["vgg"][f"conv_{torch_idx}"],
                       pad_w=w_pad)
            y = jax.nn.relu(y)
            is_last_in_block = torch_idx == block[-1][0]
            if not is_last_in_block:
                h_q, h_scale = _quantize_act(y)
        h = y
        if block_i < 3:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    if circ_padding:
        h = wrap_pad_width(h, len(HEAD_CONVS))
    h_q, h_scale = _quantize_act(h)
    for i, (name, _, strides, relu_after) in enumerate(HEAD_CONVS):
        y = _qconv(h_q, h_scale, qparams[name], strides=strides, pad_w=w_pad)
        if relu_after:
            y = jax.nn.relu(y)
        if i + 1 < len(HEAD_CONVS):
            h_q, h_scale = _quantize_act(y)
    return y.astype(jnp.float32)


def quantize_pipeline(pipeline, state):
    """Quantize both towers of a trained FovPipeline; returns
    (q_surface, q_overhead) param trees for quantized_fov_forward."""
    params = jax.tree.map(np.asarray, state.params)
    return (
        jax.tree.map(jnp.asarray, quantize_fov_params(params["surface"])),
        jax.tree.map(jnp.asarray, quantize_fov_params(params["overhead"])),
    )
