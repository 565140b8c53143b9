"""Image/transform ops vs NumPy oracles."""

import math

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from witw_tpu.ops import (
    normalize_images,
    denormalize_images,
    fov_crop,
    polar_transform,
    horizontal_shift,
    quantized_rotation,
    rotate_nearest,
    synced_rotation,
    repeat_rows,
)


def np_polar_oracle(overhead_chw, h_s, w_s):
    """Per-sample oracle for the polar transform with the reference's grid and
    independent corner clipping (model/cvig_fov.py:156-209)."""
    c, s, _ = overhead_chw.shape
    xx, yy = np.meshgrid(range(w_s), range(h_s))
    yy_o = (s / 2) + (s / 2) * (h_s - 1 - yy) / h_s * np.cos(2 * math.pi * xx / w_s)
    xx_o = (s / 2) - (s / 2) * (h_s - 1 - yy) / h_s * np.sin(2 * math.pi * xx / w_s)
    x, y = xx_o, yy_o
    x0 = np.floor(x).astype(int)
    x1 = x0 + 1
    y0 = np.floor(y).astype(int)
    y1 = y0 + 1
    x0c = np.clip(x0, 0, s - 1)
    x1c = np.clip(x1, 0, s - 1)
    y0c = np.clip(y0, 0, s - 1)
    y1c = np.clip(y1, 0, s - 1)
    Ia = overhead_chw[:, y0c, x0c]
    Ib = overhead_chw[:, y1c, x0c]
    Ic = overhead_chw[:, y0c, x1c]
    Id = overhead_chw[:, y1c, x1c]
    # Reference computes weights from the CLIPPED indices (cvig_fov.py:168-183
    # clips x0/x1/y0/y1 in place before the weight lines), so exact-boundary
    # samples get all-zero weights and output 0.
    wa = (x1c - x) * (y1c - y)
    wb = (x1c - x) * (y - y0c)
    wc = (x - x0c) * (y1c - y)
    wd = (x - x0c) * (y - y0c)
    return wa * Ia + wb * Ib + wc * Ic + wd * Id


def test_polar_transform_matches_oracle(rng):
    s_o, h_s, w_s = 16, 8, 32
    tile = rng.uniform(0, 255, size=(3, s_o, s_o)).astype(np.float32)  # CHW
    want = np_polar_oracle(tile, h_s, w_s)  # [C, h_s, w_s]
    tile_nhwc = np.transpose(tile, (1, 2, 0))[None]
    got = np.asarray(polar_transform(jnp.asarray(tile_nhwc), h_s, w_s))[0]
    np.testing.assert_allclose(np.transpose(got, (2, 0, 1)), want, rtol=1e-4, atol=1e-3)


def test_fov_crop_wraparound(rng):
    x = rng.standard_normal((2, 3, 10, 1)).astype(np.float32)
    starts = np.array([7, 2])
    out = np.asarray(fov_crop(jnp.asarray(x), jnp.asarray(starts), 5))
    for b, st in enumerate(starts):
        cols = [(st + k) % 10 for k in range(5)]
        np.testing.assert_array_equal(out[b], x[b][:, cols, :])


def test_normalize_roundtrip(rng):
    x = rng.uniform(0, 255, size=(2, 4, 4, 3)).astype(np.float32)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    norm = normalize_images(jnp.asarray(x), mean, std)
    want = (x / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(np.asarray(norm), want, rtol=1e-5)
    back = denormalize_images(norm, mean, std)
    np.testing.assert_allclose(np.asarray(back), x / 255.0, rtol=1e-4, atol=1e-5)


def test_normalize_semantic_rgb_only_scaling(rng):
    """Semantic quirk: only first 3 channels divided by 255
    (reference cvig_semantic.py:173-176)."""
    x = rng.uniform(0, 255, size=(1, 2, 2, 5)).astype(np.float32)
    mean = (0.485, 0.456, 0.406, 0.45, 0.45)
    std = (0.229, 0.224, 0.225, 0.22, 0.22)
    got = np.asarray(normalize_images(jnp.asarray(x), mean, std, scale_channels=3))
    scaled = x.copy()
    scaled[..., :3] /= 255.0
    want = (scaled - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_horizontal_shift_oracle(rng):
    x = rng.standard_normal((1, 2, 360, 1)).astype(np.float32)
    deg = 90.0
    got = np.asarray(horizontal_shift(jnp.asarray(x[0]), jnp.asarray(deg)))
    want = np.roll(x[0], -90, axis=1)
    np.testing.assert_array_equal(got, want)
    # Batched variant agrees with per-sample.
    got_b = np.asarray(horizontal_shift(jnp.asarray(x), jnp.asarray([deg])))
    np.testing.assert_array_equal(got_b[0], want)


def test_quantized_rotation_roundtrip(rng):
    x = rng.standard_normal((6, 6, 2)).astype(np.float32)
    out = x
    for _ in range(4):
        out = np.asarray(quantized_rotation(jnp.asarray(out), 1))
    np.testing.assert_array_equal(out, x)
    # factor 2 == two factor-1 rotations
    once = quantized_rotation(jnp.asarray(x), 1)
    twice = np.asarray(quantized_rotation(once, 1))
    np.testing.assert_array_equal(np.asarray(quantized_rotation(jnp.asarray(x), 2)), twice)


def test_rotate_nearest_direction_torchvision(rng):
    """rotate_nearest follows the LIVE reference path's direction:
    torchvision rotate is counter-clockwise as displayed (PIL semantics;
    reference SyncedRotation, cvig_baseline.py:142-143). A marker at the top
    must land on the LEFT after +90. The reference's own quantized_rotation
    compositions rotate the OPPOSITE way (its docstring is wrong; the class
    is dead code there) — quantized_rotation here stays bit-exact to those
    compositions, so +90 continuous == factor-3 quantized."""
    x = np.zeros((5, 5, 1), np.float32)
    x[0, 2, 0] = 1.0  # top-middle
    r = np.asarray(rotate_nearest(jnp.asarray(x), 90.0))
    assert r[2, 0, 0] == 1.0 and r.sum() == 1.0  # left-middle: CCW
    q = np.asarray(quantized_rotation(jnp.asarray(x), 1))
    assert q[2, 4, 0] == 1.0  # right-middle: the reference's flips are CW
    # at 90-degree multiples the continuous rotation reproduces the exact
    # transpose/flip grids, with the direction inversion accounted for
    y = rng.standard_normal((8, 8, 3)).astype(np.float32)
    for factor in range(4):
        got = np.asarray(rotate_nearest(jnp.asarray(y), factor * 90.0))
        want = np.asarray(quantized_rotation(jnp.asarray(y), (4 - factor) % 4))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_quantized_rotation_matches_reference_flips(rng):
    """Bit-exact transcription of the reference's transpose/flip
    compositions (cvig_baseline.py:115-127), all four factors, via a torch
    re-execution of the reference code."""
    import torch

    x = rng.standard_normal((6, 6, 2)).astype(np.float32)
    xt = torch.tensor(x.transpose(2, 0, 1))  # CHW like the reference
    for f in range(4):
        ref = xt
        if f % 4 == 1:
            ref = ref.transpose(-2, -1).flip(-1)
        elif f % 4 == 2:
            ref = ref.flip(-2).flip(-1)
        elif f % 4 == 3:
            ref = ref.transpose(-2, -1).flip(-2)
        got = np.asarray(quantized_rotation(jnp.asarray(x), f))
        np.testing.assert_array_equal(got, ref.numpy().transpose(1, 2, 0))


def test_synced_rotation_consistency(rng):
    """A distinctive column of the panorama and the corresponding overhead ray
    must rotate together (reference SyncedRotation contract,
    cvig_baseline.py:130-144)."""
    key = jax.random.PRNGKey(0)
    surface = jnp.asarray(rng.standard_normal((2, 4, 360, 1)).astype(np.float32))
    overhead = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    s2, o2 = synced_rotation(key, surface, overhead, panorama=True)
    assert s2.shape == surface.shape
    assert o2.shape == overhead.shape
    # Non-panorama surface is untouched.
    s3, _ = synced_rotation(key, surface, overhead, panorama=False)
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(surface))


def test_repeat_rows(rng):
    x = rng.standard_normal((2, 3, 4, 1)).astype(np.float32)
    out = np.asarray(repeat_rows(jnp.asarray(x), 2))
    assert out.shape == (2, 6, 4, 1)
    np.testing.assert_array_equal(out[:, 0], x[:, 0])
    np.testing.assert_array_equal(out[:, 1], x[:, 0])


def test_orientation_maps(rng):
    """Live version of the reference's dead orientation-map code
    (cvig_baseline.py:163-206): channel count, value ranges, and the overhead
    radius/azimuth geometry."""
    from witw_tpu.ops.orientation_maps import append_orientation_maps, orientation_map

    surface = jnp.asarray(rng.standard_normal((2, 8, 16, 3)).astype(np.float32))
    overhead = jnp.asarray(rng.standard_normal((2, 10, 10, 3)).astype(np.float32))
    s2, o2 = append_orientation_maps(surface, overhead)
    assert s2.shape == (2, 8, 16, 5)
    assert o2.shape == (2, 10, 10, 5)
    np.testing.assert_array_equal(np.asarray(s2[..., :3]), np.asarray(surface))
    # The uv channels are pre-encoded into the 0-255 image domain so the
    # baseline encoder's -1 + 2*(x/255) rescale recovers uv in [-1, 1]
    # exactly (the naive [-1,1] append would collapse to ~-1 post-rescale).
    recovered = -1.0 + 2.0 * (np.asarray(s2[..., 3:]) / 255.0)
    expected = np.transpose(orientation_map(8, 16, "surface"), (1, 2, 0))
    np.testing.assert_allclose(recovered[0], expected, atol=1e-6)

    uv = orientation_map(8, 16, "surface")
    assert uv.shape == (2, 8, 16)
    assert uv.min() >= -1.0 and uv.max() <= 1.0
    ov = orientation_map(10, 10, "overhead")
    # radius channel is minimal near the center, maximal at corners;
    # azimuth channel spans (-1, 1]
    assert ov[0, 5, 5] == ov[0].min()
    assert ov[0].max() == pytest.approx(1.0, abs=1e-6)
    assert -1.0 <= ov[1].min() and ov[1].max() <= 1.0
