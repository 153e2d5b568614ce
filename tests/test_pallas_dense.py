"""Pallas fused matcher vs the XLA dense path (interpret mode on CPU).

The real-TPU lowering is exercised by bench.py / the driver's compile check;
these tests pin the kernel's math to the XLA reference on small shapes."""

import numpy as np
import pytest

from stepth_tpu.config import MatchConfig
from stepth_tpu.match import dense, pallas_dense

from tests.test_match_dense import make_pair


@pytest.mark.parametrize("lr", [None, 1.0])
def test_pallas_matches_dense(rng, lr):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, window=9, cost="sad", lr_threshold=lr)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_allclose(
        np.asarray(ref.disparity), np.asarray(got.disparity), atol=1e-4
    )


def test_pallas_unaligned_shapes(rng):
    # width not a multiple of 128, height not a multiple of the tile
    left, right = make_pair(rng, h=50, w=130, shift=4)
    cfg = MatchConfig(num_disparities=8, window=5, cost="sad", lr_threshold=None)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ref.disparity), np.asarray(got.disparity), atol=1e-4
    )


def test_pallas_rejects_unsupported_cost(rng):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, cost="ssd")
    with pytest.raises(NotImplementedError):
        pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)


def test_pallas_census_matches_dense(rng):
    left, right = make_pair(rng, h=48, w=160, shift=5)
    cfg = MatchConfig(num_disparities=16, window=9, cost="census", lr_threshold=1.0)
    ref = dense.match_pair(left, right, cfg)
    got = pallas_dense.match_pair_pallas(left, right, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_allclose(
        np.asarray(ref.disparity), np.asarray(got.disparity), atol=1e-4
    )
