"""Pallas TPU kernel: 2x2/2 max pool (NHWC), bandwidth-optimal.

The trace of the embed+match step shows XLA's reduce_window for VGG pool1
([B, 128, 512, 64] -> [B, 64, 256, 64]) moving 1.3 GB at only ~44% of HBM
bandwidth (~1.9 ms per tower). This kernel streams non-overlapping row
blocks through VMEM with Pallas' automatic double buffering and computes the
max with two reshape-free-in-lane reductions. Inference-path only (no custom
VJP); the training path keeps XLA's reduce_window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, rows, width, ch):
    x = x_ref[0]  # [2*rows, W, C]
    x = x.reshape(rows, 2, width, ch)
    y = jnp.maximum(x[:, 0], x[:, 1])  # [rows, W, C]
    y = y.reshape(rows, width // 2, 2, ch)
    o_ref[0] = jnp.maximum(y[:, :, 0], y[:, :, 1])


@functools.partial(jax.jit, static_argnames=("rows",))
def maxpool2x2(x: jax.Array, rows: int = 8) -> jax.Array:
    """Max pool 2x2 stride 2, VALID (torch MaxPool2d(2, 2) semantics used by
    the reference towers, cvig_fov.py VGG; see models/backbones/vgg16.py).

    x: [B, H, W, C] with H, W even and H % (2*rows) == 0.
    """
    b, h, w, c = x.shape
    assert h % (2 * rows) == 0 and w % 2 == 0, (h, w, rows)
    kern = functools.partial(_kernel, rows=rows, width=w, ch=c)
    return pl.pallas_call(
        kern,
        grid=(b, h // (2 * rows)),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * rows, w, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w // 2, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * h * w * c // 4,
            bytes_accessed=x.size * x.dtype.itemsize * 5 // 4,
            transcendentals=0,
        ),
    )(x)
