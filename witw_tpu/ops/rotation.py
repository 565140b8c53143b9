"""Synced rotation augmentation (baseline model).

The reference rotates the overhead tile by a random angle and, when the
surface photo is a panorama, rolls it horizontally by the matching number of
degrees so the relative orientation stays consistent (reference
model/cvig_baseline.py:97-160). Reference rotation runs per-sample on CPU via
torchvision; here it is a batched on-device nearest-neighbor affine gather
(static shapes, vmap over per-sample angles).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def horizontal_shift(img: jax.Array, degrees: jax.Array) -> jax.Array:
    """Shift a panorama as if the viewer turned clockwise by `degrees`
    (reference cvig_baseline.py:97-112: roll by -round(deg * W / 360)).

    img: [..., H, W, C] NHWC/HWC with scalar degrees; per-sample degrees [B]
    require a batched [B, H, W, C] img.
    """
    w = img.shape[-2]
    shift = -jnp.round(degrees * w / 360.0).astype(jnp.int32)
    if jnp.ndim(shift) == 0:
        return jnp.roll(img, shift, axis=-2)
    if img.ndim != 4:
        raise ValueError(
            f"per-sample degrees need a [B, H, W, C] img, got shape {img.shape}"
        )
    cols = (jnp.arange(w)[None, :] - shift[:, None]) % w  # [B, W]
    return jnp.take_along_axis(img, cols[:, None, :, None], axis=2)


def quantized_rotation(img: jax.Array, factor: int) -> jax.Array:
    """Rotate by factor * 90 degrees using transpose/flips (exactly the
    reference's compositions, cvig_baseline.py:115-127). HWC or NHWC.

    Direction note: despite the reference docstring's "counterclockwise",
    these compositions rotate the displayed image CLOCKWISE for factor=1
    (top-left lands top-right) — the OPPOSITE of torchvision's rotate used
    by the reference's live SyncedRotation path. The quantized transform is
    dead code in the reference (never composed into a loader); it is kept
    here bit-exact to the reference's compositions, while rotate_nearest
    matches the live torchvision (counter-clockwise) semantics."""
    h_ax = img.ndim - 3
    w_ax = img.ndim - 2
    f = factor % 4
    if f == 0:
        return img
    if f == 1:
        return jnp.flip(jnp.swapaxes(img, h_ax, w_ax), axis=w_ax)
    if f == 2:
        return jnp.flip(jnp.flip(img, axis=h_ax), axis=w_ax)
    return jnp.flip(jnp.swapaxes(img, h_ax, w_ax), axis=h_ax)


def rotate_nearest(img: jax.Array, degrees: jax.Array) -> jax.Array:
    """Rotate image content counter-clockwise about the image center with
    nearest-neighbor sampling and zero fill (torchvision `rotate` defaults
    used by the reference, cvig_baseline.py:142-143).

    img: [H, W, C] or [B, H, W, C]; degrees: scalar or [B].

    The batched form gathers through ONE flat [B*H*W] global index into the
    [B*H*W, C]-flattened batch instead of vmapping a per-sample 2-D advanced
    index: identical values (same nearest indices), but measured 103.9 ->
    69.5 ms/step at the baseline family's [16, 750, 750, 3] geometry on v5e
    (exp/r5_rotation.py — this gather was 86% of that family's reference-
    eval step; uint8/bf16 gathers are barely faster and NOT exact for the
    non-integer resized pixels the pipeline feeds through here).
    """
    if img.ndim == 3:
        return _rotate_one(img, jnp.asarray(degrees, jnp.float32))
    b, h, w, c = img.shape
    degs = jnp.broadcast_to(jnp.asarray(degrees, jnp.float32), (b,))
    valid, yi, xi = jax.vmap(
        lambda d: _rotate_indices(h, w, d)
    )(degs)  # [B, H, W] each
    flat_idx = (yi * w + xi).reshape(b, h * w)
    gidx = (flat_idx + (jnp.arange(b) * (h * w))[:, None]).reshape(-1)
    out = img.reshape(b * h * w, c)[gidx]
    out = jnp.where(valid.reshape(b * h * w)[:, None], out, 0)
    return out.reshape(b, h, w, c).astype(img.dtype)


def _rotate_indices(h: int, w: int, degrees: jax.Array):
    """(valid, yi, xi) nearest-neighbor source indices for one rotation.

    Output pixel samples the input at the inverse rotation. For the
    torchvision-visual COUNTER-clockwise rotation (y points down in image
    coords), the forward map is R(-theta) in math convention, so the
    inverse sampling map is R(+theta)."""
    theta = degrees * (math.pi / 180.0)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    ii, jj = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    dy = ii - cy
    dx = jj - cx
    src_x = cos_t * dx - sin_t * dy + cx
    src_y = sin_t * dx + cos_t * dy + cy
    xi = jnp.round(src_x).astype(jnp.int32)
    yi = jnp.round(src_y).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    return valid, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)


def _rotate_one(img: jax.Array, degrees: jax.Array) -> jax.Array:
    h, w, c = img.shape
    valid, yi, xi = _rotate_indices(h, w, degrees)
    out = img[yi, xi]
    return jnp.where(valid[..., None], out, 0).astype(img.dtype)


def synced_rotation(
    rng: jax.Array,
    surface: jax.Array,
    overhead: jax.Array,
    panorama: bool,
    quantized: bool = False,
):
    """Batched synced rotation: random angle per sample; overhead rotated,
    panorama surface rolled to match (reference cvig_baseline.py:130-160).

    surface: [B, H, W, C]; overhead: [B, S, S, C]. Returns (surface, overhead).

    Quantized-mode quirk, reproduced from the reference: the reference's
    QuantizedSyncedRotation pairs the SAME horizontal_shift as the continuous
    path with quantized_rotation's transpose/flip compositions — which rotate
    the displayed overhead CLOCKWISE, opposite to torchvision rotate. The
    surface/overhead relative orientation in quantized mode therefore differs
    from continuous mode for factors 1 and 3. This matches the reference
    bit-for-bit (cvig_baseline.py:148-160 vs 115-127); do not "fix" it
    without breaking parity.
    """
    b = surface.shape[0]
    if quantized:
        factors = jax.random.randint(rng, (b,), 0, 4)
        degrees = factors.astype(jnp.float32) * 90.0
        overhead = jax.vmap(
            lambda im, f: jax.lax.switch(
                f, [lambda x: quantized_rotation(x, k) for k in range(4)], im
            )
        )(overhead, factors)
    else:
        degrees = jax.random.uniform(rng, (b,)) * 360.0
        overhead = rotate_nearest(overhead, degrees)
    if panorama:
        surface = horizontal_shift(surface, degrees)
    return surface, overhead
