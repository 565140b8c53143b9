"""Baseline twin-tower encoder: 7 strided convs + multi-scale GeM pooling.

Reference architecture (model/cvig_baseline.py:228-283): seven k=4 s=2
unpadded convs (3->64->128->256->512x4), LeakyReLU(0.2) *then* BatchNorm,
input scaled to [-1, 1], weights ~ N(0, 0.02). The embedding concatenates
generalized-mean pooled (p=3) ReLU features of conv5/6/7 outputs (1536-d) and
is scaled by f/||f||^0.5 — deliberately *not* unit normalization. The overhead
tower is the identical architecture with separate weights
(cvig_baseline.py:282-283).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from witw_tpu.configs.base import BaselineModelConfig

CHANNELS = (64, 128, 256, 512, 512, 512, 512)


def _normal_init(std: float, mean: float = 0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, jnp.float32)

    return init


class BaselineEncoder(nn.Module):
    cfg: BaselineModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        valid: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """``valid`` (bool [B], optional): marks real rows when the batch was
        zero-padded to a sharding multiple (train/loop.device_prefetch).
        Train-mode BatchNorm statistics are computed over valid rows only, so
        padded rows neither shift real rows' activations nor leak into the
        running batch_stats."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        p = cfg.gem_power
        bn_mask = None if valid is None else valid[:, None, None, None]

        x = jnp.asarray(x, jnp.float32) / 255.0
        x = -1.0 + 2.0 * x
        x = x.astype(dtype)

        feats = []
        for i, ch in enumerate(CHANNELS, start=1):
            x = nn.Conv(
                ch,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding="VALID",
                dtype=dtype,
                kernel_init=_normal_init(cfg.init_std),
                bias_init=_normal_init(cfg.init_std),
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - cfg.bn_momentum,  # torch -> flax convention
                epsilon=1e-5,
                dtype=jnp.float32,
                scale_init=_normal_init(cfg.init_std, mean=1.0),
                bias_init=_normal_init(cfg.init_std),
                name=f"bn{i}",
            )(x, mask=bn_mask)
            if i >= 5:
                # Generalized-mean pooling of ReLU features over H, W
                # (reference cvig_baseline.py:272-277).
                g = jnp.power(
                    jnp.mean(jnp.power(nn.relu(x.astype(jnp.float32)), p), axis=(1, 2)),
                    1.0 / p,
                )
                feats.append(g)

        f = jnp.concatenate(feats, axis=1)  # [B, 1536]
        # f / ||f||^0.5 — pseudo-normalization (reference cvig_baseline.py:278).
        norm = jnp.linalg.norm(f, axis=1, keepdims=True)
        return f / jnp.sqrt(norm)
