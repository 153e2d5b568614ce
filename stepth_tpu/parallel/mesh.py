"""Device-mesh construction helpers.

Greenfield component (SURVEY.md §2.3): the reference's only parallelism is an
in-process rayon pool (reference src/depth_image.rs:111-129); here parallelism
is a `jax.sharding.Mesh` with a ``data`` axis (batch of stereo pairs) and a
``tile`` axis (image-row tiles with halo exchange).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    tile: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, tile)`` mesh. ``tile=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        tile = n // data
    if data * tile > n:
        raise ValueError(f"mesh {data}x{tile} needs {data * tile} devices, have {n}")
    grid = np.asarray(devices[: data * tile]).reshape(data, tile)
    return Mesh(grid, ("data", "tile"))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, tile=1)
