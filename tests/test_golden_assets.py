"""Validation against the reference's PUBLISHED golden outputs.

The disage submodule is unvendored (reference Cargo.toml:9, deps/disage empty),
so its subdivision semantics were *inferred* from call sites
(docs/SEMANTICS.md §2). The published ``assets/depth.jpg`` and
``assets/foreground.jpg`` (reference Readme.md:28-37) are the only *external*
ground truth for that inference — every other parity test (oracle == JAX ==
C++) only proves internal consistency of our own reconstruction. These tests
close that loop with JPEG-tolerant metrics (the goldens are JPEG-recompressed,
so bitwise equality is impossible by construction).

The README flow (Readme.md:8-26) splits the validation cleanly:
  * depth:      main.jpg + additional.jpg --[our pipeline]--> vs depth.jpg
                (validates the inferred subdivision + ring-search semantics);
  * foreground: the README *reloads the published depth.jpg* before
                invert/select/apply, so foreground.jpg vs our flow validates
                the k-means split + slice + mask ops independently of the
                subdivision inference.

Measured agreement (recorded in BASELINE.md):
  depth      — Pearson corr 0.988, mean|diff| 1.15 gray levels
  foreground — Pearson corr 0.997, mask (zero-pixel) agreement 98.8%
"""

import os

import numpy as np
import pytest

from tests.conftest import ASSETS

GOLD_DEPTH = os.path.join(ASSETS, "depth.jpg")
GOLD_FG = os.path.join(ASSETS, "foreground.jpg")
PRECISION = (255 // 7,) * 3  # the README's depth_precision (Readme.md:14)


def _open_gray(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("L")).astype(np.float64)


def _open_rgb(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB")).astype(np.float64)


def _corr(a, b):
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])


@pytest.fixture(scope="module")
def native_mod():
    from stepth_tpu import native

    if not native.available():
        pytest.skip(f"native engine unavailable: {native.build_error()}")
    return native


def test_depth_matches_published_golden(asset_pair, native_mod):
    """Full pipeline on the bundled pair vs the published depth.jpg.

    Runs the native C++ engine (bit-identical to the NumPy oracle and the JAX
    parity path per tests/test_native.py / test_match_parity.py, and ~100x
    faster than the oracle at full resolution)."""
    main, add = asset_pair
    ours = native_mod.depth_from_additional(main, add, PRECISION).astype(np.float64)
    gold = _open_gray(GOLD_DEPTH)
    assert ours.shape == gold.shape

    corr = _corr(ours, gold)
    mad = float(np.abs(ours - gold).mean())
    # JPEG-tolerant thresholds well below the measured 0.988 / 1.15; a wrong
    # subdivision rule drops correlation far below this (structure mismatch).
    assert corr > 0.95, f"depth corr {corr:.4f} vs published golden"
    assert mad < 4.0, f"depth mean|diff| {mad:.2f} gray levels vs golden"


def test_foreground_matches_published_golden():
    """README flow 2 (Readme.md:18-25): reload the *published* depth, invert,
    select foreground (2-zone k-means), apply mask — vs foreground.jpg."""
    from stepth_tpu.core.frame import DepthFrame

    img = DepthFrame.open(os.path.join(ASSETS, "main.jpg"))
    img = img.open_depth(GOLD_DEPTH)
    img = img.invert_depth()
    mask = img.select_foreground()
    mask = mask.apply_mask()

    ours = np.asarray(mask.image)[..., :3].astype(np.float64)
    gold = _open_rgb(GOLD_FG)
    assert ours.shape == gold.shape

    corr = _corr(ours, gold)
    # zero-pixel (masked-out) agreement: JPEG ringing keeps masked regions
    # near-but-not-exactly zero in the golden, hence the small threshold
    zo = ours.sum(-1) < 10
    zg = gold.sum(-1) < 10
    agree = float((zo == zg).mean())
    assert corr > 0.98, f"foreground corr {corr:.4f} vs published golden"
    assert agree > 0.95, f"foreground mask agreement {agree:.4f} vs golden"
