"""VGG16 feature trunk, truncated at conv4_3 (torch ``features[:23]``).

The reference builds its FOV-DSM towers from torchvision's pretrained VGG16
truncated through conv4_3+ReLU (reference model/cvig_fov.py:256-260). This is
a ground-up NHWC Flax implementation; parameter names carry the torch feature
indices (``conv_0`` ... ``conv_21``) so converted pretrained weights map 1:1
(see witw_tpu.models.convert_torch).

TPU-specific choices:
- NHWC layout (XLA:TPU native for convolutions).
- Zero padding is expressed as the conv's own padding config so XLA folds it
  into the convolution (no copies).
- Circular width padding (the overhead tower convolves a horizontally-wrapping
  polar panorama — the reference does per-conv torch layer surgery,
  cvig_fov.py:212-231): here the wrap halo is materialized once per
  conv *block* (width + n_convs per side), and the block's convolutions run
  width-VALID, consuming one halo column per conv. Translation invariance
  makes this bit-identical to per-conv circular padding while cutting the
  unfusable wrap-copy count from 13 to 4 (+1 in the head).
- Dropout2d (whole-channel dropout, rate 0.2) after conv4_1/4_2/4_3, applied
  conv -> dropout -> relu, matching the reference's AddDropout wrapper order
  (cvig_fov.py:234-245,286-288).
"""

from __future__ import annotations

from typing import Tuple

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

# Convs grouped between pools (block-level wrap halo).
VGG16_BLOCKS: Tuple[Tuple[Tuple[int, int], ...], ...] = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
)


def wrap_pad_width(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Circular-pad the width axis by `halo` per side (NHWC)."""
    if halo == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0)), mode="wrap")


class Vgg16Features(nn.Module):
    """VGG16 conv1_1 .. conv4_3 (+ReLU), 3 maxpools; output stride 8.

    ``frozen_prefix`` inserts a stop_gradient at block 4's input. When every
    block-1..3 param is frozen (the reference's idx<17 rule,
    cvig_fov.py:274-278), no gradient is ever consumed upstream of that point
    — the optimizer mask zeroes them — so skipping the backward pass through
    blocks 1-3 is numerically identical for every trainable parameter and
    removes ~2/3 of each tower's backward FLOPs.
    """

    in_channels: int = 3
    circ_padding: bool = False
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32
    frozen_prefix: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        x = x.astype(self.dtype)
        # Width is zero-padded per conv normally, or wrap-padded per block;
        # height is always zero-padded inside the conv (XLA folds it).
        w_pad = (0, 0) if self.circ_padding else (1, 1)
        for block_i, block in enumerate(VGG16_BLOCKS):
            if block_i == 3 and self.frozen_prefix:
                x = jax.lax.stop_gradient(x)
            if self.circ_padding:
                x = wrap_pad_width(x, len(block))
            for torch_idx, out_ch in block:
                x = nn.Conv(
                    out_ch,
                    kernel_size=(3, 3),
                    strides=(1, 1),
                    padding=((1, 1), w_pad),
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
            if block_i < 3:
                # torch MaxPool2d(2, 2): VALID window, floor division of size.
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x
