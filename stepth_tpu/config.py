"""Frozen configuration dataclasses.

The reference keeps all tuning as function arguments (SURVEY.md §5): matching
``precision: [u8;3]`` (reference ``src/depth_image.rs:79``), ``zones`` (:162), slice
ranges (:229), and hard-coded constants ``min_splits=16`` / ring ``max=255``
(:102, :119). We keep that spirit — small frozen dataclasses passed explicitly, no
global config files — and add the TPU-mesh knobs the reference has no analog for.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SubdivisionConfig:
    """disage-equivalent subdivision bounds (reference src/depth_image.rs:101-109).

    ``max_splits`` defaults to ceil(log2(H*W)) at call time when None.
    """

    min_splits: int = 16
    max_splits: Optional[int] = None

    def resolved_max(self, height: int, width: int) -> int:
        if self.max_splits is not None:
            return self.max_splits
        return int(math.ceil(math.log2(float(height * width))))


@dataclasses.dataclass(frozen=True)
class RingSearchConfig:
    """Expanding ring-search bounds (reference src/helpers.rs:9-54).

    ``max_radius`` mirrors the hard-coded ``max=255`` at src/depth_image.rs:119
    (rings 0..max-1 inclusive).
    """

    max_radius: int = 255


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Dense stereo matcher (the fast path; SURVEY.md §7 step 4).

    A rectified-stereo recast of the reference's brightness matching: cost volume
    over ``num_disparities`` horizontal shifts, aggregated over a ``window`` box,
    winner-take-all with optional subpixel refinement.
    """

    num_disparities: int = 64
    window: int = 9
    cost: str = "sad"  # "sad" | "ssd" | "census"
    census_window: int = 7
    subpixel: bool = True
    # Left-right consistency check threshold in disparity units; None disables.
    lr_threshold: Optional[float] = 1.0
    # Uniqueness ratio check (best vs. second-best cost); None disables.
    uniqueness: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    """Coarse-to-fine hierarchy replacing disage's adaptive recursion
    (SURVEY.md §2.1 C7 recast)."""

    levels: int = 4
    # Disparity search half-window around the upsampled coarse estimate, per level.
    refine_radius: int = 4
    coarsest_disparities: int = 32
    # Cap on adaptive per-tile base windows in the Pallas refiner: tiles whose
    # prior spans a disparity discontinuity search up to this many base ± R
    # windows; 1 restores the round-2 single-base-per-tile kernel.
    # Default 6 from the measured round-4 frontier (tools/refine_frontier.py,
    # 1080p eff-D=128, tile_rows=64 on v5e): 6 windows cost the same as 4 on
    # smooth content (1.72 vs 1.74 ms/frame — skipped tiles are free) and
    # +0.13 ms on the edge-heavy box scene, while halving bad3 on both
    # ground-truth edge scenes (box 5.11→3.15 %, ellipses 7.94→3.23 %).
    refine_windows: int = 6


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape for spatial tile sharding (greenfield; SURVEY.md §2.3)."""

    # Axis names: data (batch), tile (image-row tiles).
    data: int = 1
    tile: int = 1
    axis_names: Tuple[str, str] = ("data", "tile")


DEFAULT_PRECISION: Tuple[int, int, int] = (255 // 7,) * 3  # Readme.md:14
