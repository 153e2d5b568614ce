"""Multi-host bring-up (SURVEY.md §5 distributed-backend row).

The reference has no distributed layer at all; here multi-host runs use JAX's
standard coordinator + XLA collectives over ICI/DCN. This module is the thin
bring-up shim: initialize the process group, build the global mesh, and expose
failure-detection knobs. Multi-host TPU hardware is not available in this
environment, but the process topology IS exercised for real: the drill in
tests/test_multiprocess.py runs two OS processes (4 virtual CPU devices each)
through this module — coordination-service bring-up, one 8-device global mesh,
cross-process collectives via Gloo, and heartbeat-based peer-failure
detection (tools/multiproc_worker.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    heartbeat_timeout_s: int = 100,
    initialization_timeout_s: int = 300,
) -> None:
    """Initialize `jax.distributed` for a multi-host pod slice.

    No-ops when single-process (the common dev path). Two distinct timeouts:

    * ``initialization_timeout_s`` bounds *startup* — how long processes wait
      for each other at the coordinator barrier.
    * ``heartbeat_timeout_s`` is the *runtime* failure detector
      (``heartbeat_timeout_seconds`` of the coordination service): a host that
      stops heartbeating for this long crashes the job fail-fast instead of
      hanging the next collective. Recovery is restart-from-checkpoint
      (stepth_tpu.utils.checkpoint; drill in tests/test_failure_recovery.py).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("STEPTH_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout_s,
        heartbeat_timeout_seconds=heartbeat_timeout_s,
    )


def global_mesh(data: int = 1, tile: Optional[int] = None) -> Mesh:
    """Build the (data, tile) mesh over ALL devices across hosts. Lay the
    ``tile`` axis innermost so halo ppermutes ride ICI (neighboring devices),
    and the ``data`` axis outermost so batch all-reduces cross DCN only once
    per host group."""
    devs = jax.devices()
    n = len(devs)
    if tile is None:
        tile = n // data
    if data * tile != n:
        raise ValueError(f"mesh {data}x{tile} != {n} devices")
    grid = np.array(devs).reshape(data, tile)
    return Mesh(grid, ("data", "tile"))


def process_info() -> Tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0
