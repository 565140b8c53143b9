"""Pallas TPU kernel: 3x3 stride-1 convolution + bias + ReLU (NHWC).

Why this exists: XLA's conv at VGG block-1/2 shapes (C=64/128, large spatial)
runs at ~30-50% of its N-bound MXU ceiling on v5e — the im2col patches round-
trip through HBM. This kernel keeps the unfold in VMEM: each grid step DMAs a
(rows+2)-row slab of the padded input, builds the [rows*W, 9*C] patch matrix
as a value, and runs ONE K=9C matmul on the MXU, fusing bias+ReLU into the
epilogue. Replaces the hot convs of witw_tpu.models.backbones.vgg16 (the
compute path of reference model/cvig_fov.py:248-294's towers).

Layout notes (Mosaic):
- channels ride the lane dim; C=64 uses half the lanes (the N=C_out bound is
  architectural for this model, not a kernel artifact).
- the patch build uses static sublane/lane slices + a lane-dim concatenate of
  nine [rows*W, C] tiles — no dynamic rolls (the round-1 Mosaic blocker).
- accumulation f32 via preferred_element_type; output cast to the model's
  compute dtype after bias+ReLU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *, rows, width, cin,
            cout, relu, out_dtype):
    b = pl.program_id(0)
    h = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(h * rows, rows + 2)], x_vmem, sem
    )
    dma.start()
    dma.wait()
    cols = []
    for dy in range(3):
        for dx in range(3):
            sl = x_vmem[dy : dy + rows, dx : dx + width, :]
            cols.append(sl.reshape(rows * width, cin))
    p = jnp.concatenate(cols, axis=1)  # [rows*W, 9C]
    acc = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(rows, width, cout).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("circular", "relu", "rows", "out_dtype")
)
def conv3x3_bias_relu(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    circular: bool = False,
    relu: bool = True,
    rows: int = 8,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """3x3 stride-1 SAME conv + bias (+ReLU), NHWC, via the Pallas kernel.

    x: [B, H, W, C] (H divisible by ``rows``); kernel: [3, 3, C, N];
    bias: [N]. ``circular`` wraps the width pad (the overhead tower's
    horizontal circular padding, reference cvig_fov.py:212-231); height is
    always zero-padded.
    """
    b, h, w, c = x.shape
    n = kernel.shape[-1]
    assert h % rows == 0, (h, rows)
    x = x.astype(jnp.bfloat16)
    # width pad: wrap or zero; height pad: zero. Done in XLA (cheap, fused).
    # Mosaic requires DMA slice dims 8-aligned on the sublane (W) axis, so the
    # padded width is rounded up to a multiple of 8 (junk tail columns are
    # never read by the patch slices).
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap" if circular else "constant"
    )
    xp = jnp.pad(xp, ((0, 0), (1, 1), (0, wp - (w + 2)), (0, 0)))
    # weights -> [9C, N] with (dy, dx, c) unfold order matching the kernel
    wmat = kernel.astype(jnp.bfloat16).reshape(9 * c, n)
    bias2d = bias.reshape(1, n)

    kern = functools.partial(
        _kernel, rows=rows, width=w, cin=c, cout=n, relu=relu,
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [9C, N] weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [1, N] bias
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w, n), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wp, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * n * b * h * w,
            bytes_accessed=xp.size * 2 + b * h * w * n * 2,
            transcendentals=0,
        ),
    )(xp, wmat, bias2d)


def _kernel_cw(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *, rows, width,
               wp, cin, cout, relu, out_dtype):
    """Channels-on-sublanes / width-on-lanes variant.

    x_hbm: [B, H+2, C, Wp] bf16. Per output row r: stack the 3 input rows into
    [3C, Wp] (sublane merge), run one [N, 3C] x [3C, Wp] matmul per dx tap,
    and align the taps with STATIC lane rolls of the float32 outputs
    (Mosaic's rotate is 32-bit-only — rolling the bf16 inputs is NYI, which
    killed round 1's attempt; rolling the f32 accumulators is supported).
    Channels live on sublanes so all 128 lanes stay busy even at C=64."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(h * rows, rows + 2)], x_vmem, sem
    )
    dma.start()
    dma.wait()
    for r in range(rows):
        rows3 = x_vmem[r : r + 3].reshape(3 * cin, wp)  # (dy, c) on sublanes
        # y_dx[n, w] = sum_{dy,c} K[n,dx,dy,c] x[dy,c,w]; out[w] needs
        # y_dx[w+dx] -> roll the f32 result left by dx (wp-dx positive form).
        acc = jnp.dot(w_ref[0], rows3, preferred_element_type=jnp.float32)
        for dx in (1, 2):
            y = jnp.dot(w_ref[dx], rows3, preferred_element_type=jnp.float32)
            acc = acc + pltpu.roll(y, wp - dx, axis=1)
        acc = acc[:, :width] + b_ref[:].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, r] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("circular", "relu", "rows", "out_dtype")
)
def conv3x3_bias_relu_cw(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    circular: bool = False,
    relu: bool = True,
    rows: int = 8,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """3x3 stride-1 SAME conv + bias (+ReLU) in the [B, H, C, W] layout.

    x: [B, H, C, W] (width on the lane dim; W must be a multiple of 128);
    kernel: [3, 3, C, N] (HWIO); bias: [N]. Returns [B, H, N, W].
    Width pad wraps when ``circular`` (overhead tower), else zeros.
    """
    b, h, c, w = x.shape
    n = kernel.shape[-1]
    assert h % rows == 0, (h, rows)
    assert w % 128 == 0, f"lane dim W={w} must be 128-aligned"
    x = x.astype(jnp.bfloat16)
    # width (lane) pad to [1 | W | 1 | align]: rolls read up to w+2
    wp = -(-(w + 2) // 128) * 128
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (0, 0), (1, 1)), mode="wrap" if circular else "constant"
    )
    xp = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, wp - (w + 2))))
    # weights -> [dx, N, (dy, c)] — one [N, 3C] matrix per dx tap
    wmat = jnp.transpose(kernel.astype(jnp.bfloat16), (1, 3, 0, 2)).reshape(
        3, n, 3 * c
    )
    bias2d = bias.reshape(n, 1)

    kern = functools.partial(
        _kernel_cw, rows=rows, width=w, wp=wp, cin=c, cout=n, relu=relu,
        out_dtype=out_dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, n, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, n, w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, c, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * n * b * h * w,
            bytes_accessed=xp.size * 2 + b * h * w * n * 2,
            transcendentals=0,
        ),
    )(xp, wmat, bias2d)


def conv3x3_reference(x, kernel, bias, circular=False, relu=True,
                      out_dtype=jnp.bfloat16):
    """XLA oracle with identical padding/dtype semantics (for tests/bench)."""
    x = x.astype(jnp.bfloat16)
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap" if circular else "constant"
    )
    y = jax.lax.conv_general_dilated(
        xp, kernel.astype(jnp.bfloat16), (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)
