"""VGG16 feature trunk, truncated at conv4_3 (torch ``features[:23]``).

The reference builds its FOV-DSM towers from torchvision's pretrained VGG16
truncated through conv4_3+ReLU (reference model/cvig_fov.py:256-260). This is
a ground-up NHWC Flax implementation; parameter names carry the torch feature
indices (``conv_0`` ... ``conv_21``) so converted pretrained weights map 1:1
(see witw_tpu.models.convert_torch).

TPU-specific choices:
- NHWC layout (XLA:TPU native for convolutions).
- Optional horizontally-circular padding: panoramas wrap around the width
  seam, so the overhead (polar) tower pads width circularly and height with
  zeros on *every* conv — the reference achieves this by layer surgery on
  torch Conv2d internals (cvig_fov.py:212-231); here it is just an explicit
  pad + VALID convolution that XLA fuses.
- Dropout2d (whole-channel dropout, rate 0.2) after conv4_1/4_2/4_3, applied
  conv -> dropout -> relu, matching the reference's AddDropout wrapper order
  (cvig_fov.py:234-245,286-288).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (torch feature index, out_channels); pools sit at torch indices 4, 9, 16.
VGG16_CONVS: Tuple[Tuple[int, int], ...] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
)
POOL_AFTER = {2, 7, 14}  # pool follows these conv indices' relu
DROPOUT_CONVS = {17, 19, 21}


def pad_conv_input(x: jnp.ndarray, pad_h: int, pad_w: int, circular: bool) -> jnp.ndarray:
    """Zero-pad height; zero- or circular-pad width (NHWC)."""
    if pad_h:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)))
    if pad_w:
        mode = "wrap" if circular else "constant"
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_w, pad_w), (0, 0)), mode=mode)
    return x


class Vgg16Features(nn.Module):
    """VGG16 conv1_1 .. conv4_3 (+ReLU), 3 maxpools; output stride 8."""

    in_channels: int = 3
    circ_padding: bool = False
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for torch_idx, out_ch in VGG16_CONVS:
            x = pad_conv_input(x, 1, 1, self.circ_padding)
            x = nn.Conv(
                out_ch,
                kernel_size=(3, 3),
                strides=(1, 1),
                padding="VALID",
                dtype=self.dtype,
                name=f"conv_{torch_idx}",
            )(x)
            if torch_idx in DROPOUT_CONVS and self.dropout_rate > 0:
                x = nn.Dropout(
                    rate=self.dropout_rate,
                    broadcast_dims=(1, 2),
                    deterministic=not train,
                    name=f"dropout_{torch_idx}",
                )(x)
            x = nn.relu(x)
            if torch_idx in POOL_AFTER:
                # torch MaxPool2d(2, 2): VALID window, floor division of size.
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x
