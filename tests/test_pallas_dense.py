"""Pallas fused matcher vs the XLA dense path (interpret mode on CPU).

The real-TPU lowering is exercised by bench.py / the driver's compile check;
these tests pin the kernel's math to the XLA reference on small shapes."""

import numpy as np
import pytest

from stepth_tpu.config import MatchConfig
from stepth_tpu.match import dense, pallas_dense

from tests.test_match_dense import make_pair


def _assert_close_results(ref, got, atol=0.05):
    """Kernel vs XLA: same math, different f32 summation order (the kernel's
    two-stage box sums reassociate adds), so subpixel values may differ by
    ~1e-2 px at degenerate parabolas and a validity bit may flip at an exact
    LR-threshold boundary. Require near-total agreement."""
    valid_agree = (np.asarray(ref.valid) == np.asarray(got.valid)).mean()
    assert valid_agree > 0.999, valid_agree
    d = np.abs(np.asarray(ref.disparity) - np.asarray(got.disparity))
    both_valid = np.asarray(ref.valid) & np.asarray(got.valid)
    assert np.quantile(d[both_valid], 0.999) <= atol


@pytest.mark.parametrize("lr", [None, 1.0])
def test_pallas_matches_dense(rng, lr):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, window=9, cost="sad", lr_threshold=lr)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    _assert_close_results(ref, got)


def test_pallas_unaligned_shapes(rng):
    # width not a multiple of 128, height not a multiple of the tile;
    # window 5 uses the flat (non-reassociated) box path → tight tolerance
    left, right = make_pair(rng, h=50, w=130, shift=4)
    cfg = MatchConfig(num_disparities=8, window=5, cost="sad", lr_threshold=None)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref.disparity), np.asarray(got.disparity), atol=1e-4
    )


def test_pallas_ssd_matches_dense(rng):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, window=9, cost="ssd", lr_threshold=1.0)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    _assert_close_results(ref, got)


def test_pallas_rejects_unsupported_cost(rng):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, cost="rank")
    with pytest.raises(NotImplementedError):
        pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)


def test_pallas_census_matches_dense(rng):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, window=9, cost="census", lr_threshold=1.0)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    _assert_close_results(ref, got)


@pytest.mark.parametrize("lr", [None, 1.0])
def test_pallas_uniqueness_matches_dense(rng, lr):
    """Uniqueness-ratio validity in the fused kernel (VERDICT round-1 item 8):
    the in-loop second-best tracker (±1 exclusion) matches dense.wta's masked
    min. Run at a few thresholds so both mostly-valid and mostly-invalid
    regimes are exercised."""
    left, right = make_pair(rng, h=48, w=160, shift=5)
    for uniq in (0.0, 0.05, 0.3):
        cfg = MatchConfig(
            num_disparities=16, window=9, cost="sad",
            lr_threshold=lr, uniqueness=uniq,
        )
        ref = dense.match_pair(left, right, cfg)
        got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
        valid_agree = (np.asarray(ref.valid) == np.asarray(got.valid)).mean()
        assert valid_agree > 0.995, (uniq, valid_agree)
        # the fraction invalidated must move with the threshold identically
        assert abs(np.asarray(ref.valid).mean() - np.asarray(got.valid).mean()) < 0.005


def test_fill_invalid_pallas_matches_dense(rng):
    """The Pallas occlusion fill is bit-exact vs dense.fill_invalid (pure
    selects over the same values), including all-invalid rows and edges."""
    from stepth_tpu.match import pallas_post

    disp = rng.uniform(0, 60, (48, 200)).astype(np.float32)
    valid = rng.uniform(size=(48, 200)) > 0.4
    valid[5] = False  # an all-invalid row
    valid[7] = True
    valid[:, :3] = False  # invalid left border
    want = np.asarray(dense.fill_invalid(disp, valid))
    got = np.asarray(pallas_post.fill_invalid_pallas(disp, valid, interpret=True))
    np.testing.assert_array_equal(want, got)
