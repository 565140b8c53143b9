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

Two variants, measured on TPU v5e at CVUSA geometry (batch 128):
- dynamic per-batch activation scales (quantized_fov_forward): NOT faster
  than bf16 (1410 vs 1750 pairs/s) — the per-layer abs-max reductions and
  float round-trips eat the MXU gain. Kept for memory-constrained serving.
- static calibrated scales + fused requant epilogues + int8-first
  preprocessing (quantized_fov_forward_static + preprocess_static_int8):
  **2610-2720 pairs/s vs 1880 bf16** — the production serving path and the
  bench.py default; retrieval-rank agreement with the f32 towers is
  test-gated (tests/test_quantize.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from witw_tpu.models.backbones.vgg16 import (
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


def quantize_pipeline(state):
    """Quantize both towers of a trained FovPipeline state; returns
    (q_surface, q_overhead) param trees for quantized_fov_forward."""
    params = jax.tree.map(np.asarray, state.params)
    return (
        jax.tree.map(jnp.asarray, quantize_fov_params(params["surface"])),
        jax.tree.map(jnp.asarray, quantize_fov_params(params["overhead"])),
    )


# ---------------------------------------------------------------------------
# Static-scale variant: activation scales calibrated offline, requantization
# folded into one per-channel int32 -> int8 epilogue per conv (no per-batch
# abs-max reductions or float round-trips between layers).
# ---------------------------------------------------------------------------

_TRUNK_ORDER = tuple(
    f"conv_{i}" for i, _ in [c for blk in VGG16_BLOCKS for c in blk]
)
_CONV_ORDER = _TRUNK_ORDER + tuple(name for name, _, _, _ in HEAD_CONVS)


def calibrate_fov_activation_scales(params, batches, circ_padding=False,
                                    include_head: bool = True):
    """Run the f32 tower over calibration batches recording each conv input's
    abs-max; returns {'input': s0, 'conv_N': s_after_that_conv, ...} where the
    scale stored under a conv name is the abs-max of its (post-ReLU) OUTPUT —
    i.e. the next conv's input. ``batches``: iterable of normalized NHWC
    float inputs. ``include_head=False`` calibrates the shared VGG trunk only
    (the SAFA family: trunk int8, SAFA head f32)."""
    batches = list(batches)
    if not batches:
        raise ValueError(
            "calibration requires at least one batch: empty input would "
            "leave every activation scale at its 1e-12 floor and quantize "
            "all activations to +-127"
        )
    order = _CONV_ORDER if include_head else _TRUNK_ORDER
    maxes = {k: 0.0 for k in order}
    in_max = 0.0
    for x in batches:
        h = jnp.asarray(x, jnp.float32)
        in_max = max(in_max, float(jnp.max(jnp.abs(h))))
        w_pad = (0, 0) if circ_padding else (1, 1)
        for block_i, block in enumerate(VGG16_BLOCKS):
            if circ_padding:
                h = wrap_pad_width(h, len(block))
            for torch_idx, _ in block:
                kv = params["vgg"][f"conv_{torch_idx}"]
                h = jax.lax.conv_general_dilated(
                    h, jnp.asarray(kv["kernel"], jnp.float32), (1, 1),
                    (((1, 1), w_pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.asarray(kv["bias"], jnp.float32)
                h = jax.nn.relu(h)
                name = f"conv_{torch_idx}"
                maxes[name] = max(maxes[name], float(jnp.max(jnp.abs(h))))
            if block_i < 3:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        if not include_head:
            continue
        if circ_padding:
            h = wrap_pad_width(h, len(HEAD_CONVS))
        for name, _, strides, relu_after in HEAD_CONVS:
            kv = params[name]
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(kv["kernel"], jnp.float32), strides,
                (((1, 1), w_pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(kv["bias"], jnp.float32)
            if relu_after:
                h = jax.nn.relu(h)
            maxes[name] = max(maxes[name], float(jnp.max(jnp.abs(h))))
    scales = {"input": max(in_max, 1e-12) / 127.0}
    for k, v in maxes.items():
        scales[k] = max(v, 1e-12) / 127.0
    return scales


def prepare_static_qparams(params, act_scales, first_conv_bf16: bool = False):
    """Fold weights + calibrated scales into per-conv static tables:
    kernel_q int8 [3,3,Ci,Co], bias_q int32 [Co] (bias in the conv's int32
    accumulator domain), requant_m float32 [Co] (acc -> next layer's int8
    domain), dequant float32 [Co] (acc -> f32, for the final conv).

    ``first_conv_bf16``: run conv1_1 on the MXU in bf16 instead of int8.
    conv1_1's contraction is only 9*3=27 deep — XLA's int8 conv at that shape
    measures ~13 TOPS on v5e (profiled; the im2col path degenerates). The
    bf16 form is faster in isolation but a WASH end-to-end (2553 vs 2557-2584
    baseline, NOTES.md round-3 v7) — conv1_1 is layout-bound, not dtype-bound
    — so it stays a non-default. The input scale is folded into the bf16
    kernel (k*s_in) so the conv consumes the int8 input directly; output
    requantizes into conv1_2's int8 domain."""
    out = {"vgg": {}}
    s_in = act_scales["input"]
    prev = s_in
    order = tuple(k for k in _CONV_ORDER if k in act_scales)
    for idx, name in enumerate(order):
        kv = params["vgg"][name] if name in params.get("vgg", {}) else params[name]
        k = np.asarray(kv["kernel"], np.float32)
        nxt = act_scales[name]
        if idx == 0 and first_conv_bf16:
            entry = {
                "kernel_bf16": (k * s_in).astype(jnp.bfloat16),
                "bias_f": np.asarray(kv["bias"], np.float32),
                "inv_next": np.float32(1.0 / nxt),
            }
        else:
            s_w = np.maximum(np.max(np.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
            kq = np.clip(np.round(k / s_w), -127, 127).astype(np.int8)
            acc_scale = prev * s_w  # int32 acc unit -> f32
            bias_q = np.round(np.asarray(kv["bias"], np.float32) / acc_scale).astype(np.int32)
            entry = {
                "kernel_q": kq,
                "bias_q": bias_q,
                "requant_m": (acc_scale / nxt).astype(np.float32),
                "dequant": acc_scale.astype(np.float32),
                "bias_f": np.asarray(kv["bias"], np.float32),
            }
        (out["vgg"] if name in params.get("vgg", {}) else out)[name] = entry
        prev = nxt
    out["input_scale"] = np.float32(s_in)
    return out


def _requant(acc, m, relu):
    """int32 conv accumulator -> next layer's int8, ReLU folded into the
    clip's lower bound."""
    y = jnp.round(acc.astype(jnp.float32) * m)
    lo = 0.0 if relu else -127.0
    return jnp.clip(y, lo, 127.0).astype(jnp.int8)


def w2d_kernel(k: np.ndarray, f: int) -> np.ndarray:
    """Width space-to-depth transform of a 3x3 conv kernel.

    A stride-1 SAME conv over [B,H,W,C] is EXACTLY a stride-1 SAME conv over
    the free NHWC reshape [B,H,W/f,f*C] (w = f*j + dj, channel = dj*C + c)
    producing [B,H,W/f,f*O] (channel = q*O + o, reshaped back for free):

        Y[h, f*j+q, o] = sum_{bx,dj,c,ky} K2[ky, bx+1, dj*C+c, q*O+o]
                                          * X2[h+ky-1, j+bx, dj*C+c]
        K2[ky, bx+1, dj*C+c, q*O+o] = K[ky, dx, c, o],  dx = f*bx + dj - q + 1
                                      (zero when dx is outside [0, 3))

    Rationale: conv1_1's C_in=3 contraction is layout-degenerate on the MXU
    (measured 9-13 TOPS, NOTES.md round-2b); the transformed conv has f*C_in
    contraction and f*C_out output lanes at f x the FLOPs — a win whenever
    the achieved rate grows faster than f."""
    ky_, kx_, c_, o_ = k.shape
    assert (ky_, kx_) == (3, 3)
    k2 = jnp.zeros((3, 3, f, c_, f, o_), k.dtype)
    for bx in (-1, 0, 1):
        for dj in range(f):
            for q in range(f):
                dx = f * bx + dj - q + 1
                if 0 <= dx < 3:
                    k2 = k2.at[:, bx + 1, dj, :, q, :].set(k[:, dx, :, :])
    return k2.reshape(3, 3, f * c_, f * o_)


def _pool_slices(h):
    """2x2/s2 max-pool as an elementwise max of four strided slices —
    candidate replacement for reduce_window (same math; measured variant).
    Odd trailing rows/cols are dropped like reduce_window's VALID padding
    (torch MaxPool2d floor semantics) — the four slices must agree in shape."""
    h2 = 2 * (h.shape[1] // 2)
    w2 = 2 * (h.shape[2] // 2)
    return jnp.maximum(
        jnp.maximum(h[:, 0:h2:2, 0:w2:2], h[:, 1:h2:2, 0:w2:2]),
        jnp.maximum(h[:, 0:h2:2, 1:w2:2], h[:, 1:h2:2, 1:w2:2]),
    )


def quantized_fov_forward_static(
    sq, x, circ_padding: bool = False, x_quantized: bool = False,
    first_conv_im2col: bool = False, saturation_out: list = None,
    split_block1: bool = False, first_conv_w2d: int = 0,
    pool_slices: bool = False, block2_w2d: int = 0,
):
    """Static-scale int8 forward of the FOV-DSM tower (inference only).

    Exactly one int8 conv + one fused int32->int8 epilogue per layer; no
    dynamic abs-max reductions. x: normalized NHWC float input — or, with
    ``x_quantized``, an int8 input already in this tower's input-scale domain
    (see preprocess_static_int8). Returns the f32 [B, h, w, 16] embedding map
    (same contract as FovDsm eval).

    ``first_conv_im2col``: lower conv1_1 as explicit 9-shift int8 patches
    [B,H,W,27] + a 1x1 conv — a candidate workaround for XLA's degenerate
    C_in=3 conv layout (measured 9-13 TOPS, NOTES.md round-2b).

    ``saturation_out``: optional list; appends (clip_hits, size) per requant
    so callers can measure the fraction of activations clipping at +-127 —
    the calibration-coverage guard (see static_int8_saturation).

    ``first_conv_w2d``: run conv1_1 in width space-to-depth form with block
    factor f (see w2d_kernel) — exact math, f x the FLOPs, but f*C_in
    contraction and f*C_out output lanes instead of the degenerate C_in=3.
    Requires width % f == 0. ``block2_w2d``: same transform for conv2_1
    (C_in=64 measured at 111 TOPS vs conv2_2's 286 at C_in=128).

    ``pool_slices``: max-pool as an elementwise max of 4 strided slices
    instead of reduce_window (same math; measured variant)."""
    w_pad = (0, 0) if circ_padding else (1, 1)
    if x_quantized:
        assert x.dtype == jnp.int8, x.dtype
        h = x
    else:
        x = jnp.asarray(x, jnp.float32)
        h = quantize_input(x, sq["input_scale"])

    def qconv(h_q, entry, strides=(1, 1)):
        return jax.lax.conv_general_dilated(
            h_q, entry["kernel_q"], strides, ((1, 1), w_pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ) + entry["bias_q"]

    def requant(acc, m, relu):
        q = _requant(acc, m, relu)
        if saturation_out is not None:
            saturation_out.append(
                (jnp.sum(q == 127) + jnp.sum(q == -127), q.size)
            )
        return q

    def qconv_im2col(h_q, entry):
        # conv1_1 only: SAME height pad always; width already wrap-padded for
        # the circular tower (w_pad == (0,0)), zero-padded otherwise.
        hp = jnp.pad(h_q, ((0, 0), (1, 1), w_pad, (0, 0)))
        b_, hh, ww, cc = h_q.shape
        out_w = ww if not circ_padding else ww - 2
        patches = jnp.concatenate(
            [
                hp[:, dy:dy + hh, dx:dx + out_w, :]
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )  # [B, H, W, 9*C]
        k = entry["kernel_q"]  # [3, 3, C, Co]
        k11 = k.reshape(9 * k.shape[2], k.shape[3])[None, None]
        return jax.lax.conv_general_dilated(
            patches, k11, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ) + entry["bias_q"]

    def bf16_conv(h_q, entry):
        acc = jax.lax.conv_general_dilated(
            h_q.astype(jnp.bfloat16), entry["kernel_bf16"], (1, 1),
            ((1, 1), w_pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + entry["bias_f"]
        y = jnp.round(acc * entry["inv_next"])
        q = jnp.clip(y, 0.0, 127.0).astype(jnp.int8)  # relu folded
        if saturation_out is not None:
            # Only the +127 rail is saturation here: the 0 rail is the folded
            # ReLU, not a calibration miss. Without this the first_conv_bf16
            # path's clipping is invisible to check_saturation.
            saturation_out.append((jnp.sum(q == 127), q.size))
        return q

    def qconv_w2d(h_q, entry, f):
        # First-of-block conv in width space-to-depth form (exact; see
        # w2d_kernel). Applies its own wrap pad (1 block) on the circular
        # tower, so the caller must exclude it from the block-level halo.
        b_, hh, ww, cc = h_q.shape
        assert ww % f == 0, (ww, f)
        hb = h_q.reshape(b_, hh, ww // f, f * cc)
        if circ_padding:
            hb = jnp.concatenate([hb[:, :, -1:], hb, hb[:, :, :1]], axis=2)
        k2 = w2d_kernel(entry["kernel_q"], f)
        acc = jax.lax.conv_general_dilated(
            hb, k2, (1, 1), ((1, 1), (0, 0) if circ_padding else (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ) + jnp.tile(entry["bias_q"], f)
        q = requant(acc, jnp.tile(entry["requant_m"], f), relu=True)
        return q.reshape(b_, hh, ww, entry["kernel_q"].shape[-1])

    if first_conv_w2d and "kernel_q" not in sq["vgg"]["conv_0"]:
        raise ValueError(
            "first_conv_w2d requires int8 conv_0 tables; this tower was "
            "prepared with first_conv_bf16=True — the two first-conv "
            "variants are mutually exclusive"
        )
    w2d_blocks = {0: first_conv_w2d, 1: block2_w2d}
    for block_i, block in enumerate(VGG16_BLOCKS):
        convs = block
        f_blk = w2d_blocks.get(block_i, 0)
        if f_blk:
            h = qconv_w2d(h, sq["vgg"][f"conv_{block[0][0]}"], f_blk)
            convs = block[1:]
        if circ_padding:
            h = wrap_pad_width(h, len(convs))
        for conv_i, (torch_idx, _) in enumerate(convs):
            entry = sq["vgg"][f"conv_{torch_idx}"]
            if (torch_idx == 2 and split_block1 and not circ_padding):
                # Semantically identical explicit width pad: breaks XLA's
                # conv1_1+requant+conv1_2 mega-fusion on the zero-padded
                # tower (the wrap-pad concat already breaks it on the
                # circular tower, whose split form traced faster).
                hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
                acc = jax.lax.conv_general_dilated(
                    hp, entry["kernel_q"], (1, 1), ((1, 1), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                ) + entry["bias_q"]
                h = requant(acc, entry["requant_m"], relu=True)
            elif "kernel_bf16" in entry:
                h = bf16_conv(h, entry)
            elif torch_idx == 0 and first_conv_im2col:
                h = requant(qconv_im2col(h, entry), entry["requant_m"], relu=True)
            else:
                h = requant(qconv(h, entry), entry["requant_m"], relu=True)
        if block_i < 3:
            if pool_slices:
                h = _pool_slices(h)
            else:
                h = jax.lax.reduce_window(
                    h, jnp.int8(-127), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID"
                )
    if circ_padding:
        h = wrap_pad_width(h, len(HEAD_CONVS))
    for i, (name, _, strides, relu_after) in enumerate(HEAD_CONVS):
        entry = sq[name]
        acc = qconv(h, entry, strides)
        if i + 1 < len(HEAD_CONVS):
            h = requant(acc, entry["requant_m"], relu=relu_after)
        else:
            # final conv: dequantize (bias already added in acc domain; use
            # the float bias for exactness instead)
            acc = acc - entry["bias_q"]
            y = acc.astype(jnp.float32) * entry["dequant"] + entry["bias_f"]
            return jax.nn.relu(y) if relu_after else y


def quantize_tower_static(
    tower_params, calib_batches, circ_padding: bool, first_conv_bf16: bool = False
):
    """Calibrate one tower on normalized NHWC batches and fold the static
    tables; returns device-ready params for quantized_fov_forward_static."""
    params = jax.tree.map(np.asarray, tower_params)
    scales = calibrate_fov_activation_scales(params, calib_batches, circ_padding)
    return jax.tree.map(
        jnp.asarray, prepare_static_qparams(params, scales, first_conv_bf16)
    )


def quantize_pipeline_static(state, calib_batches, first_conv_bf16=False):
    """Calibrate + fold both towers; returns (sq_surface, sq_overhead) for
    quantized_fov_forward_static. ``calib_batches``: iterable of
    (surface_norm, polar_norm) f32 NHWC pairs (preprocessed). Depends only on
    the trained params — circular padding per tower is structural (surface
    zero-pad, overhead wrap) and hardcoded accordingly."""
    params = jax.tree.map(np.asarray, state.params)
    calib_batches = list(calib_batches)  # a generator must survive both uses
    surf_b = [np.asarray(s) for s, _ in calib_batches]
    polar_b = [np.asarray(p) for _, p in calib_batches]
    return (
        quantize_tower_static(params["surface"], surf_b, False, first_conv_bf16),
        quantize_tower_static(params["overhead"], polar_b, True, first_conv_bf16),
    )


# ---------------------------------------------------------------------------
# SAFA-family static serving (VERDICT r3 #7): the SAFA towers share the FOV
# towers' VGG16 trunk (models/safa.py), so the trunk runs through the same
# static-int8 tables; only the final trunk conv dequantizes straight from its
# int32 accumulator (no int8 re-rounding of the feature map) and the SAFA
# attention head — two tiny einsums + the embedding sum, <1% of the tower's
# FLOPs — stays f32. Gated by the same rank-agreement contract as the FOV
# path (tests/test_quantize.py).
# ---------------------------------------------------------------------------


def safa_head_apply(head_params, feats: jnp.ndarray) -> jnp.ndarray:
    """Functional f32 transcription of models.safa.SafaHead.__call__ for the
    static serving path (per-head 2-layer MLP masks over the channel-max
    plan; Shi et al. NeurIPS 2019)."""
    b, h, w, c = feats.shape
    f = feats.reshape(b, h * w, c)
    plan = jnp.max(f, axis=-1)
    w1 = jnp.asarray(head_params["fc1"], jnp.float32)
    b1 = jnp.asarray(head_params["fc1_bias"], jnp.float32)
    w2 = jnp.asarray(head_params["fc2"], jnp.float32)
    b2 = jnp.asarray(head_params["fc2_bias"], jnp.float32)
    hidden = jnp.einsum("bp,pqm->bqm", plan, w1) + b1
    masks = jnp.einsum("bqm,qpm->bpm", hidden, w2) + b2
    embed = jnp.einsum("bpc,bpm->bmc", f, masks).reshape(b, -1)
    norm = jnp.linalg.norm(embed, axis=-1, keepdims=True)
    return embed / jnp.maximum(norm, 1e-12)


def quantized_safa_forward_static(
    sq, head_params, x, circ_padding: bool = False, x_quantized: bool = False,
    saturation_out: list = None,
):
    """Static-scale int8 forward of one SAFA tower (inference only): int8
    VGG trunk -> f32 conv4_3 features (dequantized in the accumulator
    domain, ReLU in f32) -> f32 SAFA head -> unit embedding [B, M*C].

    ``sq``: trunk tables from quantize_safa_tower_static. Same input
    contract as quantized_fov_forward_static (normalized NHWC floats, or
    int8 in the input-scale domain with ``x_quantized``)."""
    w_pad = (0, 0) if circ_padding else (1, 1)
    if x_quantized:
        assert x.dtype == jnp.int8, x.dtype
        h = x
    else:
        h = quantize_input(jnp.asarray(x, jnp.float32), sq["input_scale"])

    def qconv(h_q, entry):
        return jax.lax.conv_general_dilated(
            h_q, entry["kernel_q"], (1, 1), ((1, 1), w_pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ) + entry["bias_q"]

    last_idx = VGG16_BLOCKS[-1][-1][0]
    feats = None
    for block_i, block in enumerate(VGG16_BLOCKS):
        if circ_padding:
            h = wrap_pad_width(h, len(block))
        for torch_idx, _ in block:
            entry = sq["vgg"][f"conv_{torch_idx}"]
            acc = qconv(h, entry)
            if torch_idx == last_idx:
                # final trunk conv: dequantize the accumulator directly (use
                # the float bias for exactness), ReLU in f32 — the SAFA head
                # consumes full-precision features, not 127-level ones
                acc = acc - entry["bias_q"]
                feats = jax.nn.relu(
                    acc.astype(jnp.float32) * entry["dequant"] + entry["bias_f"]
                )
            else:
                q = _requant(acc, entry["requant_m"], relu=True)
                if saturation_out is not None:
                    saturation_out.append(
                        (jnp.sum(q == 127) + jnp.sum(q == -127), q.size)
                    )
                h = q
        if block_i < 3:
            h = jax.lax.reduce_window(
                h, jnp.int8(-127), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID"
            )
    return safa_head_apply(head_params, feats)


def quantize_safa_tower_static(tower_params, calib_batches, circ_padding: bool):
    """Calibrate one SAFA tower's VGG trunk on normalized NHWC batches and
    fold the static tables; returns (sq_trunk, head_params_f32) for
    quantized_safa_forward_static."""
    params = jax.tree.map(np.asarray, tower_params)
    scales = calibrate_fov_activation_scales(
        params, calib_batches, circ_padding, include_head=False
    )
    sq = jax.tree.map(jnp.asarray, prepare_static_qparams(params, scales))
    head = jax.tree.map(jnp.asarray, params["safa"])
    return sq, head


def quantize_safa_pipeline_static(state, calib_batches):
    """Calibrate + fold both SAFA towers; returns ((sq_s, head_s),
    (sq_o, head_o)). ``calib_batches``: iterable of (surface_norm,
    polar_norm) f32 NHWC pairs, like quantize_pipeline_static."""
    params = jax.tree.map(np.asarray, state.params)
    calib_batches = list(calib_batches)
    surf_b = [np.asarray(s) for s, _ in calib_batches]
    polar_b = [np.asarray(p) for _, p in calib_batches]
    return (
        quantize_safa_tower_static(params["surface"], surf_b, False),
        quantize_safa_tower_static(params["overhead"], polar_b, True),
    )


# ---------------------------------------------------------------------------
# Int8-first preprocessing: normalize + quantize the RAW inputs (small
# tensors), then run the FOV roll and the polar transform's 4-corner gather
# on int8 — the f32 path's gathers/copies are ~4x the HBM traffic and were
# ~10% of the profiled serving step. Exact at polar boundary samples (the
# gather weights vanish there, emitting 0 = the reference's clip-then-weight
# zero); interior adds at most ~1 int8 LSB of interpolation rounding, gated
# by the rank-agreement tests.
# ---------------------------------------------------------------------------


def quantize_input(x: jnp.ndarray, scale) -> jnp.ndarray:
    """f32 -> symmetric int8 in the given activation-scale domain."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def polar_transform_static_int8(
    tile_q: jnp.ndarray, surface_height: int, surface_width: int,
    corner_major: str = "k",
) -> jnp.ndarray:
    """Polar-map int8 normalized tiles to int8 pseudo-panoramas.

    Same sampling grid as ops.polar.polar_grid (reference
    model/cvig_fov.py:156-209); the bilinear blend runs on gathered int8
    corners in f32 and rounds back to the same int8 domain (weights sum to 1
    in the interior, 0 at boundary samples).

    ``corner_major``: layout of the stacked 4-corner gather. "k" gathers
    corner-major [B, 4, h*w, C]; "p" gathers pixel-major [B, h*w, 4, C] so
    the blend reduces a minor axis (candidate for fusing the s8->f32 convert
    into the reduce instead of a standalone relayout pass)."""
    from witw_tpu.ops.polar import polar_grid

    b, s, s2, c = tile_q.shape
    assert s == s2 and tile_q.dtype == jnp.int8
    grid = polar_grid(surface_height, surface_width, s)
    idx = jnp.asarray(grid.idx)      # [4, h*w]
    weight = jnp.asarray(grid.weight)  # [4, h*w]
    flat = tile_q.reshape(b, s * s, c)
    # One stacked 4-corner gather + einsum blend. (Measured alternative —
    # four separate per-corner gathers with a fused weighted add — is ~3%
    # slower end-to-end: the per-corner gathers re-walk the tile operand and
    # cost more than the relayout they avoid.)
    if corner_major == "p":
        corners = flat[:, idx.T, :]  # [B, h*w, 4, C] int8
        out = jnp.einsum("bpkc,kp->bpc", corners.astype(jnp.float32), weight)
    else:
        corners = flat[:, idx, :]  # [B, 4, h*w, C] int8
        out = jnp.einsum("bkpc,kp->bpc", corners.astype(jnp.float32), weight)
    out = jnp.clip(jnp.round(out), -127, 127).astype(jnp.int8)
    return out.reshape(b, grid.out_hw[0], grid.out_hw[1], c)


def static_int8_saturation(sq, x, circ_padding: bool = False) -> float:
    """Fraction of requantized activations clipping at +-127 across every
    layer of one static-int8 forward — the calibration-coverage guard: scales
    calibrated on too small a sample silently clip hotter activations on
    later batches (VERDICT r2 weak #4). Near-zero on the calibration data
    itself; rising values on held-out data mean the calibration sample did
    not span the input distribution."""
    sats: list = []
    quantized_fov_forward_static(sq, x, circ_padding, saturation_out=sats)
    hits = sum(int(h) for h, _ in sats)
    total = sum(t for _, t in sats)
    return hits / max(total, 1)


# Calibration-coverage guard threshold: warn when more than this fraction of
# requantized activations clip at +-127 on a held-out batch (the calibration
# sample did not span the input distribution; VERDICT r2 weak #4).
SATURATION_WARN_FRACTION = 0.01


def calibrate_overhead_span(tower_params, read_item, n, sample_size,
                            preprocess, quantize_fn=None):
    """Grid/gallery-SPANNING static-int8 calibration for an overhead tower.

    Samples ``sample_size`` items evenly over [0, n) (first-batch-only
    calibration silently clipped hotter later items), reads each with
    ``read_item(i) -> HWC f32``, calibrates via ``preprocess`` (normalize +
    polar), and returns ``(sq_params, items)`` where ``items`` maps sampled
    index -> the already-read array so embed loops don't re-read them.
    Shared by the heatmap sweep and the index builder — the two int8 gallery
    entry points must keep one coverage contract.

    ``quantize_fn(tower_params, calib_batches, circ_padding)`` selects the
    family's static folder (default: the FOV towers'
    quantize_tower_static; SAFA sweeps pass quantize_safa_tower_static)."""
    if quantize_fn is None:
        quantize_fn = quantize_tower_static
    calib_idx = np.unique(np.linspace(0, n - 1, min(n, sample_size)).astype(int))
    calib = np.stack([read_item(int(i)) for i in calib_idx])
    items = dict(zip(calib_idx.tolist(), calib))
    polar_c = preprocess(jnp.asarray(calib))
    sq = quantize_fn(tower_params, [np.asarray(polar_c)], True)
    return sq, items


def static_int8_saturation_safa(sq_head, x, circ_padding: bool = False) -> float:
    """static_int8_saturation for a SAFA tower's (sq, head) pair — same
    clip-fraction contract over the int8 trunk's requantized activations."""
    sats: list = []
    quantized_safa_forward_static(
        sq_head[0], sq_head[1], x, circ_padding, saturation_out=sats
    )
    hits = sum(int(h) for h, _ in sats)
    total = sum(t for _, t in sats)
    return hits / max(total, 1)


def static_int8_saturation_baseline(sq, x, circ_padding: bool = False) -> float:
    """static_int8_saturation for a baseline tower — same clip-fraction
    contract over the requantized activations (``circ_padding`` unused: the
    baseline convs are unpadded, reference cvig_baseline.py:237-239)."""
    sats: list = []
    quantized_baseline_forward_static(sq, x, saturation_out=sats)
    hits = sum(int(h) for h, _ in sats)
    total = sum(t for _, t in sats)
    return hits / max(total, 1)


def check_saturation(sq, x, circ_padding: bool = True,
                     context: str = "input", saturation_fn=None) -> float:
    """Measure clip fraction on a held-out batch and warn above the
    SATURATION_WARN_FRACTION threshold. Returns the fraction (recorded into
    index metadata by callers). ``saturation_fn`` selects the family's
    measurement (default: the FOV towers'; SAFA passes
    static_int8_saturation_safa)."""
    if saturation_fn is None:
        saturation_fn = static_int8_saturation
    frac = saturation_fn(sq, x, circ_padding)
    if frac > SATURATION_WARN_FRACTION:
        import warnings

        warnings.warn(
            f"int8 activation saturation {frac:.2%} exceeds "
            f"{SATURATION_WARN_FRACTION:.2%} — calibration sample may not "
            f"span the {context} distribution; scores may clip"
        )
    return frac


def preprocess_static_int8(data_cfg, sq_s, sq_o, batch, rng, corner_major="k"):
    """Serving-path preprocess mirroring FovPipeline._preprocess in int8.

    batch: {'surface': [B,H,Wmax,C], 'overhead': [B,S,S,C]} raw uint8-scale.
    Returns (surface_q, polar_q) int8 in each tower's input-scale domain."""
    from witw_tpu.ops.fov import fov_crop, random_fov_starts
    from witw_tpu.ops.image import normalize_images

    d = data_cfg
    surface = jnp.asarray(batch["surface"], jnp.float32)
    overhead = jnp.asarray(batch["overhead"], jnp.float32)
    scale_ch = 3 if d.dataset.semantic else None

    surf_q = quantize_input(
        normalize_images(surface, d.img_mean, d.img_std, scale_ch),
        sq_s["input_scale"],
    )
    if d.dataset.panorama:
        sw = d.surface_width
        if d.random_orientation:
            starts = random_fov_starts(rng, surface.shape[0], d.surface_width_max)
        else:
            starts = jnp.zeros((surface.shape[0],), jnp.int32)
        if sw < d.surface_width_max:
            surf_q = fov_crop(surf_q, starts, sw)
        elif d.random_orientation:
            surf_q = fov_crop(surf_q, starts, d.surface_width_max)

    # Plain normalize (no masked bias): the polar gather's weights vanish at
    # boundary samples, so the bias masking of the f32 path emerges for free.
    tile_q = quantize_input(
        normalize_images(overhead, d.img_mean, d.img_std, scale_ch),
        sq_o["input_scale"],
    )
    polar_q = polar_transform_static_int8(
        tile_q, d.surface_height, d.surface_width_max, corner_major=corner_major
    )
    return surf_q, polar_q


# ---------------------------------------------------------------------------
# Baseline-family static serving: the 7-conv GeM twin towers
# (models/baseline.py; reference model/cvig_baseline.py:228-283). Completes
# the static-int8 serving matrix across the four model families (FOV /
# semantic / SAFA / baseline). Per layer: one int8 k=4 s=2 VALID conv with an
# int32 accumulator, then one fused f32 epilogue (dequant + conv bias +
# LeakyReLU + eval-mode BatchNorm affine + requantize-to-next-scale). The
# reference's deliberate LeakyReLU-THEN-BatchNorm order means BN cannot fold
# into the conv kernel — it folds into the epilogue's per-channel
# multiply-add instead. GeM pooling (p=3) of conv5/6/7 and the f/||f||^0.5
# pseudo-normalization stay f32 (<0.1% of the tower FLOPs). Gated by the same
# embedding-cosine + retrieval-rank-agreement contract as the other families
# (tests/test_quantize.py).
# ---------------------------------------------------------------------------

_BASELINE_LAYERS = 7


def _baseline_bn_affine(params, stats, i: int):
    """Eval-mode BatchNorm as a per-channel affine (g, b): y = x * g + b."""
    g = np.asarray(params[f"bn{i}"]["scale"], np.float32) / np.sqrt(
        np.asarray(stats[f"bn{i}"]["var"], np.float32) + 1e-5
    )
    b = (
        np.asarray(params[f"bn{i}"]["bias"], np.float32)
        - np.asarray(stats[f"bn{i}"]["mean"], np.float32) * g
    )
    return g, b


def calibrate_baseline_scales(params, batch_stats, batches,
                              leaky_slope: float = 0.2):
    """f32 eval-mode tower over RAW uint8-scale NHWC batches, recording the
    [-1,1]-scaled input's and each BatchNorm output's abs-max (= the next
    conv's int8 input scale). Layer 7's BN output feeds only the f32 GeM
    pool, so no scale is recorded for it."""
    batches = list(batches)
    if not batches:
        raise ValueError(
            "calibration requires at least one batch: empty input would "
            "leave every activation scale at its 1e-12 floor and quantize "
            "all activations to +-127"
        )
    maxes = {i: 0.0 for i in range(1, _BASELINE_LAYERS)}
    in_max = 0.0
    for x in batches:
        h = -1.0 + 2.0 * (jnp.asarray(x, jnp.float32) / 255.0)
        in_max = max(in_max, float(jnp.max(jnp.abs(h))))
        for i in range(1, _BASELINE_LAYERS + 1):
            kv = params[f"conv{i}"]
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(kv["kernel"], jnp.float32), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(kv["bias"], jnp.float32)
            h = jnp.where(h >= 0, h, leaky_slope * h)
            g, b = _baseline_bn_affine(params, batch_stats, i)
            h = h * jnp.asarray(g) + jnp.asarray(b)
            if i < _BASELINE_LAYERS:
                maxes[i] = max(maxes[i], float(jnp.max(jnp.abs(h))))
    scales = {"input": max(in_max, 1e-12) / 127.0}
    for i, v in maxes.items():
        scales[i] = max(v, 1e-12) / 127.0
    return scales


def quantize_baseline_tower_static(variables, calib_batches,
                                   leaky_slope: float = 0.2):
    """Calibrate one baseline tower on raw uint8-scale NHWC batches and fold
    the static tables for quantized_baseline_forward_static.

    ``variables``: the flax {"params", "batch_stats"} variable dict of one
    models.baseline.BaselineEncoder tower (eval-mode running stats are folded
    into the epilogue affine)."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    scales = calibrate_baseline_scales(params, stats, calib_batches,
                                       leaky_slope)
    prev = scales["input"]
    layers = []
    for i in range(1, _BASELINE_LAYERS + 1):
        k = np.asarray(params[f"conv{i}"]["kernel"], np.float32)
        s_w = np.maximum(np.max(np.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
        g, b = _baseline_bn_affine(params, stats, i)
        entry = {
            "kernel_q": np.clip(np.round(k / s_w), -127, 127).astype(np.int8),
            # int32 accumulator -> f32, per output channel (the conv bias is
            # added in f32 after dequant — no bias rounding).
            "dequant": (prev * s_w).astype(np.float32),
            "bias_f": np.asarray(params[f"conv{i}"]["bias"], np.float32),
            "bn_g": g.astype(np.float32),
            "bn_b": b.astype(np.float32),
        }
        if i < _BASELINE_LAYERS:
            entry["inv_next"] = np.float32(1.0 / scales[i])
            prev = scales[i]
        layers.append(entry)
    return jax.tree.map(
        jnp.asarray, {"input_scale": np.float32(scales["input"]),
                      "layers": tuple(layers)}
    )


def quantized_baseline_forward_static(
    sq, x, gem_power: float = 3.0, leaky_slope: float = 0.2,
    saturation_out: list = None,
):
    """Static-scale int8 forward of one baseline tower (inference only).

    ``x``: RAW NHWC uint8-scale floats — the BaselineEncoder input contract
    (reference cvig_baseline.py:265-266's [-1,1] scaling is applied before
    the input quantization). Returns the f32 [B, 1536] embedding with the
    reference's GeM concat + f/||f||^0.5 pseudo-normalization
    (cvig_baseline.py:272-278)."""
    x = -1.0 + 2.0 * (jnp.asarray(x, jnp.float32) / 255.0)
    h = quantize_input(x, sq["input_scale"])
    feats = []
    n = len(sq["layers"])
    for i, entry in enumerate(sq["layers"], start=1):
        acc = jax.lax.conv_general_dilated(
            h, entry["kernel_q"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        z = acc.astype(jnp.float32) * entry["dequant"] + entry["bias_f"]
        z = jnp.where(z >= 0, z, leaky_slope * z)
        z = z * entry["bn_g"] + entry["bn_b"]
        if i >= 5:
            feats.append(jnp.power(
                jnp.mean(jnp.power(jax.nn.relu(z), gem_power), axis=(1, 2)),
                1.0 / gem_power,
            ))
        if i < n:
            q = jnp.clip(jnp.round(z * entry["inv_next"]), -127, 127)
            h = q.astype(jnp.int8)
            if saturation_out is not None:
                saturation_out.append(
                    (jnp.sum(q == 127) + jnp.sum(q == -127), q.size)
                )
    f = jnp.concatenate(feats, axis=1)
    # f / ||f||^0.5 with no epsilon — identical to the f32 tower.
    norm = jnp.linalg.norm(f, axis=1, keepdims=True)
    return f / jnp.sqrt(norm)


def quantize_baseline_pipeline_static(state, calib_batches,
                                      leaky_slope: float = 0.2):
    """Calibrate + fold both baseline towers; returns (sq_surface,
    sq_overhead) for quantized_baseline_forward_static.

    ``calib_batches``: iterable of (surface_raw, overhead_raw) NHWC pairs in
    the encoder's raw-pixel domain — after host geometry + synced rotation
    (+ orientation-map channels, which are pre-encoded into the image domain:
    ops/orientation_maps.append_orientation_maps), before the in-model [-1,1]
    scaling."""
    calib = list(calib_batches)
    vs = {"params": state.params["surface"],
          "batch_stats": state.batch_stats["surface"]}
    vo = {"params": state.params["overhead"],
          "batch_stats": state.batch_stats["overhead"]}
    return (
        quantize_baseline_tower_static(vs, [s for s, _ in calib], leaky_slope),
        quantize_baseline_tower_static(vo, [o for _, o in calib], leaky_slope),
    )
