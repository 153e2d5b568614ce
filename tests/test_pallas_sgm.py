"""Pallas SGM pipeline vs the XLA backend (interpret mode on CPU; the
env-gated on-TPU twin lives in tests/test_tpu_kernels.py). The XLA backend is
itself oracle-verified (tests/test_match_sgm.py), so equality here closes the
chain oracle == XLA == Pallas."""

import numpy as np
import pytest

from stepth_tpu.config import MatchConfig
from stepth_tpu.match import pallas_sgm, sgm


def _pair(rng, h=40, w=72, shift=5):
    left = rng.uniform(0, 255, (h, w)).astype(np.float32)
    right = np.roll(left, -shift, axis=1).astype(np.float32)
    return left, right


def _assert_equal(ref, got):
    # disparity: identical winners up to exact-cost WTA ties — box aggregation
    # differs in f32 summation order between the integral-image (XLA) and
    # roll-add (kernel) formulations, so a pixel whose two best disparities
    # tie exactly can flip winner (observed ≤1 px per image; the two values
    # then differ by ≤1 disparity). Same tolerance story as the dense kernel.
    d_ref = np.asarray(ref.disparity)
    d_got = np.asarray(got.disparity)
    diff = np.abs(d_ref - d_got)
    flipped = diff > 1e-4
    assert flipped.mean() < 0.005, f"{flipped.sum()} mismatching pixels"
    assert diff.max() <= 1.0 + 1e-4, diff.max()
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_allclose(
        np.asarray(ref.cost), np.asarray(got.cost), rtol=1e-5, atol=1e-2
    )


@pytest.mark.parametrize("directions", [2, 4, 8])
def test_matches_xla_directions(directions):
    rng = np.random.default_rng(directions)
    left, right = _pair(rng)
    cfg = MatchConfig(num_disparities=16, window=5, cost="sad", lr_threshold=1.0)
    sc = sgm.SGMConfig(directions=directions)
    ref = sgm.match_pair_sgm(left, right, cfg, sc)
    got = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, sc, interpret=True)
    _assert_equal(ref, got)


@pytest.mark.parametrize("cost", ["sad", "ssd", "census"])
def test_matches_xla_costs(cost):
    rng = np.random.default_rng(7)
    left, right = _pair(rng)
    cfg = MatchConfig(
        num_disparities=16, window=5, cost=cost, census_window=5, lr_threshold=1.0
    )
    sc = sgm.SGMConfig(p1=2.0, p2=8.0) if cost == "census" else sgm.SGMConfig()
    ref = sgm.match_pair_sgm(left, right, cfg, sc)
    got = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, sc, interpret=True)
    _assert_equal(ref, got)


def test_matches_xla_uniqueness_and_window9():
    rng = np.random.default_rng(11)
    left, right = _pair(rng, h=48, w=96, shift=7)
    cfg = MatchConfig(
        num_disparities=32, window=9, cost="sad", lr_threshold=1.0, uniqueness=0.05
    )
    ref = sgm.match_pair_sgm(left, right, cfg)
    got = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, interpret=True)
    _assert_equal(ref, got)


def test_matches_xla_no_checks():
    rng = np.random.default_rng(13)
    left, right = _pair(rng)
    cfg = MatchConfig(
        num_disparities=16, window=3, cost="sad", lr_threshold=None, subpixel=True
    )
    ref = sgm.match_pair_sgm(left, right, cfg)
    got = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, interpret=True)
    _assert_equal(ref, got)


def test_odd_shape_padding():
    # shapes far from tile multiples: padding/masking must not leak
    rng = np.random.default_rng(17)
    left, right = _pair(rng, h=37, w=61, shift=3)
    cfg = MatchConfig(num_disparities=16, window=5, cost="sad", lr_threshold=1.0)
    ref = sgm.match_pair_sgm(left, right, cfg)
    got = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, interpret=True)
    _assert_equal(ref, got)


def test_recovers_known_shift():
    rng = np.random.default_rng(19)
    h, w, shift = 64, 128, 6
    tex = rng.uniform(0, 255, (h, w + shift)).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    tex = np.apply_along_axis(lambda m: np.convolve(m, k, "same"), 1, tex)
    left, right = tex[:, :w], tex[:, shift : w + shift]
    cfg = MatchConfig(num_disparities=16, window=5, cost="sad")
    res = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, interpret=True)
    med = float(np.median(np.asarray(res.disparity)[8:-8, 8:-8]))
    assert abs(med - shift) < 0.5, med


def test_bf16_volume_close():
    """The bf16-volume fast mode stays within a small disparity deviation of
    the exact f32 mode (bf16 rounds the materialized costs to ~0.4% relative;
    winners flip only where the two best path costs are that close)."""
    rng = np.random.default_rng(7)
    left, right = _pair(rng, h=48, w=96, shift=6)
    cfg = MatchConfig(num_disparities=16, window=5, lr_threshold=1.0)
    ref = pallas_sgm.match_pair_sgm_pallas(
        left, right, cfg, sgm.SGMConfig(directions=4), interpret=True
    )
    got = pallas_sgm.match_pair_sgm_pallas(
        left, right, cfg, sgm.SGMConfig(directions=4, volume_dtype="bf16"),
        interpret=True,
    )
    d_ref = np.asarray(ref.disparity)
    d_got = np.asarray(got.disparity)
    diff = np.abs(d_ref - d_got)
    assert np.median(diff) <= 0.1, np.median(diff)
    assert (diff <= 1.0).mean() > 0.98, (diff > 1.0).mean()


def test_bad_volume_dtype_raises():
    rng = np.random.default_rng(8)
    left, right = _pair(rng)
    with pytest.raises(ValueError, match="volume_dtype"):
        pallas_sgm.match_pair_sgm_pallas(
            left, right, MatchConfig(num_disparities=8, window=5),
            sgm.SGMConfig(volume_dtype="f16"), interpret=True,
        )


def test_scan_tiling_knobs_are_exact():
    """``step_block`` / ``lane_tile`` only re-tile the scan grid — the
    recurrence order (and therefore every f32 op) is unchanged, so any legal
    tiling must produce bit-identical path costs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    D, S, T = 8, 64, 256
    vol = jnp.asarray(rng.uniform(0, 50, (D, S, T)).astype(np.float32))
    kw = dict(S_real=S - 5, T_real=T - 9, p1=4.0, p2=16.0, interpret=True)
    ref = pallas_sgm._scan_direction(vol, vol, reverse=False, **kw)
    for bs, tt in ((16, None), (32, 128), (8, 128), (64, 256)):
        got = pallas_sgm._scan_direction(
            vol, vol, reverse=False, step_block=bs, lane_tile=tt, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # reverse direction too (block order flips)
    ref_r = pallas_sgm._scan_direction(vol, vol, reverse=True, **kw)
    got_r = pallas_sgm._scan_direction(
        vol, vol, reverse=True, step_block=16, lane_tile=128, **kw
    )
    np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(got_r))


def test_scan_lane_tile_below_128_rejected():
    """ADVICE r3 (low): a lane_tile cap below one lane register (128) used to
    be silently ignored (TT stayed 128); it must fail loudly instead."""
    import jax.numpy as jnp

    vol = jnp.zeros((8, 16, 256), jnp.float32)
    with pytest.raises(ValueError, match="lane_tile"):
        pallas_sgm._scan_direction(
            vol, None, S_real=16, T_real=256, p1=4.0, p2=16.0,
            reverse=False, lane_tile=64, interpret=True,
        )


def test_large_disparity_falls_back_to_unfused(monkeypatch):
    """ADVICE r4 (low): D > 128 exceeds the fused-WTA scan's boundary band;
    4/8-direction configs must fall back to the unfused aggregate + WTA path
    (which has no such limit) instead of raising."""
    calls = {"fused": 0}
    orig = pallas_sgm._scan_wta_direction

    def spy(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pallas_sgm, "_scan_wta_direction", spy)
    rng = np.random.default_rng(21)
    left, right = _pair(rng, h=24, w=176, shift=3)
    cfg = MatchConfig(num_disparities=144, window=3, lr_threshold=1.0)
    sc = sgm.SGMConfig(directions=4)
    got = pallas_sgm.match_pair_sgm_pallas(left, right, cfg, sc, interpret=True)
    assert calls["fused"] == 0, "D=144 must not take the fused-WTA path"
    ref = sgm.match_pair_sgm(left, right, cfg, sc)
    _assert_equal(ref, got)
