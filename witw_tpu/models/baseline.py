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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact nn.BatchNorm2d semantics.

    flax's nn.BatchNorm updates the running variance with the BIASED batch
    variance; torch normalizes with the biased variance but updates the
    running buffer with the UNBIASED (Bessel-corrected, n/(n-1)) one. The
    reference trains with torch BN (cvig_baseline.py:241-253), so eval-phase
    losses of a from-identical-init run drift between the two conventions —
    and fine-tuning a converted reference checkpoint would keep feeding the
    wrong correction into its running buffers. Variable layout matches flax
    (params scale/bias, batch_stats mean/var) so checkpoints and the int8
    calibration path (models/quantize._baseline_bn_affine) are unchanged.

    ``momentum`` is torch-style: running = (1-m)*running + m*batch.
    ``mask`` ([B,1,1,1] bool, optional) excludes zero-padded straggler rows
    from the batch statistics (see BaselineEncoder.__call__).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    scale_init: object = nn.initializers.ones
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: bool, mask=None):
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # fast variance (E[x^2] - E[x]^2), the same formulation flax BN
            # uses — keeps padded-vs-unpadded grad roundoff in the band the
            # parity tests pin (two-pass variance measurably widened it)
            per_ch = x32.shape[1] * x32.shape[2]
            if mask is None:
                n = x32.shape[0] * per_ch
                mean = jnp.mean(x32, axis=(0, 1, 2))
                m2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            else:
                w = mask.astype(jnp.float32)  # [B, 1, 1, 1]
                n = jnp.sum(w) * per_ch
                mean = jnp.sum(x32 * w, axis=(0, 1, 2)) / n
                m2 = jnp.sum(jnp.square(x32) * w, axis=(0, 1, 2)) / n
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                # torch stores the Bessel-corrected variance in the buffer
                ra_var.value = (
                    (1.0 - m) * ra_var.value + m * var * (n / (n - 1.0))
                )
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x32 - mean) * (inv * scale) + bias


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
                precision=cfg.conv_precision,
                kernel_init=_normal_init(cfg.init_std),
                bias_init=_normal_init(cfg.init_std),
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=cfg.leaky_slope)
            x = TorchBatchNorm(
                momentum=cfg.bn_momentum,
                epsilon=1e-5,
                scale_init=_normal_init(cfg.init_std, mean=1.0),
                bias_init=_normal_init(cfg.init_std),
                name=f"bn{i}",
            )(x, use_running_average=not train, mask=bn_mask)
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
