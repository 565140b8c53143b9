"""VGG16 + SAFA (Spatial-Aware Feature Aggregation) embedding towers.

BASELINE.json's benchmark configs describe the baseline-family towers as
"VGG16+SAFA" (Shi et al., NeurIPS 2019 — the aggregation the DSM/FOV line of
work builds on). SAFA learns M spatial attention masks from the feature map's
channel-max plan and emits the concatenation of M attention-weighted sums —
a global embedding vector matched with plain Euclidean/cosine distance (no
orientation alignment needed, the polar transform supplies rough alignment).

Architecture here: the shared witw_tpu VGG16 trunk (through conv4_3, NHWC)
-> max-over-channels plan [B, h*w] -> per-head 2-layer MLP (hw -> hw/d -> hw)
-> attention masks [B, h*w, M] -> embedding concat_m(sum_hw F * mask_m)
[B, M*C], L2-normalized. Heads are dimension-halving (d=2) as in the paper.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from witw_tpu.configs.base import SafaModelConfig
from witw_tpu.models.backbones.vgg16 import Vgg16Features


class SafaHead(nn.Module):
    """Spatial-aware position embedding: M masks from the max-pooled plan.

    Each head owns an independent 2-layer MLP (hw -> hw/d -> hw), as in the
    published spatial-aware module (Shi et al. NeurIPS 2019): the per-head
    weights are rank-3 tensors contracted with einsum, NOT a shared
    bottleneck — a shared fc1 would make all M masks linear functions of one
    hidden vector and rank-limit head diversity.
    """

    num_heads: int = 8
    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = features.shape
        hw = h * w
        hid = hw // self.reduction
        m = self.num_heads
        f = features.reshape(b, hw, c)
        plan = jnp.max(f, axis=-1)  # [B, hw] channel-max plan
        w_init = nn.initializers.truncated_normal(stddev=0.005)
        b_init = nn.initializers.constant(0.1)
        w1 = self.param("fc1", w_init, (hw, hid, m), jnp.float32)
        b1 = self.param("fc1_bias", b_init, (hid, m), jnp.float32)
        w2 = self.param("fc2", w_init, (hid, hw, m), jnp.float32)
        b2 = self.param("fc2_bias", b_init, (hw, m), jnp.float32)
        dt = self.dtype
        hidden = jnp.einsum("bp,pqm->bqm", plan.astype(dt), w1.astype(dt)) + b1.astype(dt)
        masks = jnp.einsum("bqm,qpm->bpm", hidden, w2.astype(dt)) + b2.astype(dt)
        # attention-weighted sums per head -> [B, M, C]
        embed = jnp.einsum("bpc,bpm->bmc", f.astype(jnp.float32), masks.astype(jnp.float32))
        embed = embed.reshape(b, m * c)
        norm = jnp.linalg.norm(embed, axis=-1, keepdims=True)
        return embed / jnp.maximum(norm, 1e-12)


class VggSafa(nn.Module):
    """One SAFA tower: VGG16 trunk + SAFA aggregation -> unit embedding."""

    cfg: SafaModelConfig
    circ_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        feats = Vgg16Features(
            in_channels=self.cfg.in_channels,
            circ_padding=self.circ_padding,
            dropout_rate=0.0,
            dtype=dtype,
            name="vgg",
        )(x, train=train)
        return SafaHead(
            num_heads=self.cfg.num_heads,
            reduction=self.cfg.reduction,
            dtype=dtype,
            name="safa",
        )(feats)


def safa_trainable_mask(params, cfg: SafaModelConfig):
    """Freeze VGG blocks 1-3 like the FOV-DSM towers (torch idx < 17);
    conv4_x and the SAFA head train."""

    def decide(path_names) -> bool:
        if not cfg.freeze_backbone:
            return True
        for name in path_names:
            if name.startswith("conv_"):
                return int(name.split("_")[1]) >= 17
        return True

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return decide(path)

    return walk(params)
