"""Accuracy & throughput metrics (SURVEY.md §5 observability plan; the metric
triplet of BASELINE.md: frames/s/chip, disparity EPE, BA iters/s)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def end_point_error(disp, disp_gt, valid=None) -> Dict[str, float]:
    """Disparity end-point-error stats vs ground truth: mean EPE, >1px and >3px
    outlier fractions (the standard stereo triple)."""
    d = np.asarray(disp, dtype=np.float64)
    g = np.asarray(disp_gt, dtype=np.float64)
    m = np.ones(d.shape, bool) if valid is None else np.asarray(valid, bool)
    err = np.abs(d - g)[m]
    if err.size == 0:
        return {"epe": float("nan"), "bad1": float("nan"), "bad3": float("nan"),
                "density": 0.0}
    return {
        "epe": float(err.mean()),
        "bad1": float((err > 1.0).mean()),
        "bad3": float((err > 3.0).mean()),
        "density": float(m.mean()),
    }


def depth_agreement(depth_a, depth_b) -> Dict[str, float]:
    """u8 depth-map agreement: exact-match fraction, mean |Δ|, max |Δ| — the
    parity report used against the oracle/native baselines."""
    a = np.asarray(depth_a, dtype=np.int32)
    b = np.asarray(depth_b, dtype=np.int32)
    diff = np.abs(a - b)
    return {
        "exact": float((diff == 0).mean()),
        "mean_abs": float(diff.mean()),
        "max_abs": int(diff.max()),
    }


def ate_rmse(poses_a, poses_b) -> float:
    """Absolute trajectory error (RMSE of translation components) between two
    pose arrays [N, 6] in the same gauge."""
    ta = np.asarray(poses_a)[:, 3:]
    tb = np.asarray(poses_b)[:, 3:]
    return float(np.sqrt(((ta - tb) ** 2).sum(axis=1).mean()))


def masked_fraction(mask, true_value: int = 255) -> float:
    return float((np.asarray(mask) == true_value).mean())
