"""Pallas bilinear remap vs the XLA ``map_coordinates`` path.

The kernel must agree with :func:`stepth_tpu.ops.rectify.remap_bilinear` to
f32 rounding inside the image and exactly on the fill mask — that is the
seam contract of VERDICT round-2 #5 (device-resident rectification)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stepth_tpu.ops import rectify
from stepth_tpu.ops.pallas_remap import plan_remap, remap_bilinear_pallas


def _rot_map(h, w, sh, sw, angle, scale=1.0, shift=(0.0, 0.0)):
    """Inverse sample map: output pixel → rotated/scaled source position."""
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    cx, cy = (sw - 1) / 2.0, (sh - 1) / 2.0
    c, s = np.cos(angle), np.sin(angle)
    xs = (xx - cx) * c - (yy - cy) * s
    ys = (xx - cx) * s + (yy - cy) * c
    x = xs * scale + cx + shift[0]
    y = ys * scale + cy + shift[1]
    return np.stack([x, y], axis=-1).astype(np.float32)


def _check(img, map_xy, fill=0.0, tile_rows=16):
    spec, plan = plan_remap(map_xy, img.shape[:2], tile_rows=tile_rows)
    got = np.asarray(
        remap_bilinear_pallas(jnp.asarray(img), spec, plan, fill=fill)
    )
    want = np.asarray(rectify.remap_bilinear(jnp.asarray(img), jnp.asarray(map_xy), fill=fill))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)
    # the fill mask must agree exactly
    assert np.array_equal(got == fill, want == fill) or np.allclose(
        got[want == fill], fill
    )


def test_identity_map(rng):
    h, w = 64, 160
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    m = _rot_map(h, w, h, w, 0.0)
    spec, plan = plan_remap(m, (h, w))
    got = np.asarray(remap_bilinear_pallas(jnp.asarray(img), spec, plan))
    np.testing.assert_allclose(got, img, atol=1e-4)


def test_rotation_map(rng):
    h, w = 96, 200
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    _check(img, _rot_map(h, w, h, w, 0.05))


def test_rotation_scale_shift_and_fill(rng):
    h, w = 80, 256
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # strong warp → real out-of-image regions exercise the fill mask
    _check(img, _rot_map(h, w, h, w, -0.12, scale=1.2, shift=(9.3, -4.7)),
           fill=3.5)


def test_different_output_shape(rng):
    sh, sw = 100, 180
    img = rng.uniform(0, 255, (sh, sw)).astype(np.float32)
    m = _rot_map(56, 144, sh, sw, 0.08, scale=0.9)
    _check(img, m)


def test_color_planes(rng):
    h, w = 64, 160
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    _check(img, _rot_map(h, w, h, w, 0.03, shift=(2.2, 1.1)))


def test_rectify_rig_maps(rng):
    """End-to-end: real rectification maps (rotated rig + distortion) drive
    both remap paths to the same rectified image."""
    h, w = 96, 192
    K = np.array([[180.0, 0, 95.0], [0, 180.0, 47.0], [0, 0, 1]], np.float32)
    ang = 0.04
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    T = np.array([-0.6, 0.02, 0.01], np.float32)
    maps = rectify.rectify_maps(K, K, R, T, (h, w), dist1=(0.05, -0.01, 0.001, 0.0))
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    for m in (maps.map_left, maps.map_right):
        _check(img, np.asarray(m))


def test_plan_rejects_wild_maps():
    h, w = 32, 256
    m = np.zeros((h, w, 2), np.float32)
    # pathological: source column jumps by hundreds inside one lane tile
    m[..., 0] = np.tile(np.arange(w) * 37.0 % (w - 1), (h, 1))
    m[..., 1] = 5.0
    with pytest.raises(ValueError):
        plan_remap(m, (h, w))
