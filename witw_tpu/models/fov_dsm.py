"""FOV-DSM tower: truncated VGG16 + 3-conv embedding head.

Reference architecture (model/cvig_fov.py:248-294): VGG16 features[:23]
followed by three xavier-initialized convs — 512->256 stride (2,1),
256->64 stride (2,1), 64->16 stride 1, ReLU between (none after the last) —
producing a spatial embedding map [B, 16, H/32ish, W/8] used for orientation
correlation. VGG blocks 1-3 are frozen (torch idx < 17); the semantic variant
widens conv1_1 to 5 input channels and keeps it trainable
(cvig_semantic.py:301-309).

Output layout here is NHWC: [B, h, w, 16].
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from witw_tpu.configs.base import FovDsmModelConfig
from witw_tpu.models.backbones.vgg16 import Vgg16Features, VGG16_CONVS, wrap_pad_width

# Head conv specs: (name, out_channels, (stride_h, stride_w), relu_after).
# All head convs have width-stride 1, so the circular tower can take its
# whole width halo (3 columns per side) in one wrap pad.
HEAD_CONVS = (
    ("conv_23", 256, (2, 1), True),
    ("conv_25", 64, (2, 1), True),
    ("conv_27", 16, (1, 1), False),
)


class FovDsm(nn.Module):
    cfg: FovDsmModelConfig
    circ_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        # Blocks 1-3 frozen with nothing trainable below them (the standard
        # fov config; semantic trains conv1_1) -> skip their backward pass.
        frozen_prefix = self.cfg.freeze_backbone and not self.cfg.train_first_conv
        x = Vgg16Features(
            in_channels=self.cfg.in_channels,
            circ_padding=self.circ_padding,
            dropout_rate=self.cfg.dropout_rate,
            dtype=dtype,
            frozen_prefix=frozen_prefix,
            name="vgg",
        )(x, train=train)
        if self.circ_padding:
            x = wrap_pad_width(x, len(HEAD_CONVS))
        w_pad = (0, 0) if self.circ_padding else (1, 1)
        for name, out_ch, strides, relu_after in HEAD_CONVS:
            x = nn.Conv(
                out_ch,
                kernel_size=(3, 3),
                strides=strides,
                padding=((1, 1), w_pad),
                dtype=dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name=name,
            )(x)
            if relu_after:
                x = nn.relu(x)
        # Embedding map in float32 for the correlation/distance math.
        return x.astype(jnp.float32)


def fov_dsm_trainable_mask(params: Dict[str, Any], cfg: FovDsmModelConfig) -> Dict[str, Any]:
    """Boolean pytree: True = trainable. Mirrors the reference's freezing rule
    (torch feature idx < 17 frozen, cvig_fov.py:274-278; semantic keeps
    conv1_1 trainable, cvig_semantic.py:306-309)."""

    def decide(path_names) -> bool:
        if not cfg.freeze_backbone:
            return True
        for name in path_names:
            if name.startswith("conv_"):
                idx = int(name.split("_")[1])
                if idx >= 17:
                    return True
                if idx == 0 and cfg.train_first_conv:
                    return True
                return False
        return True

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return decide(path)

    return walk(params)
