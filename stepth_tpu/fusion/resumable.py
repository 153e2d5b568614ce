"""Resumable bundle adjustment: the production failure-recovery path.

The reference's failure story is a panic (reference src/depth_image.rs:45-48);
SURVEY.md §5 mandates detection + recovery for the multi-host build. Rounds
1-3 proved the two halves separately — heartbeat peer-failure detection
(tests/test_multiprocess.py) and bit-exact checkpoint/kill/resume
(tests/test_failure_recovery.py) — but only as test drills. This module wires
them into a capability (VERDICT r3 item 7):

* :func:`solve_resumable` — a segmented LM solve that checkpoints its full
  iteration state (poses, points, LM lambda, iteration counter) every
  ``every`` iterations and **auto-restores** when its checkpoint already
  exists. A process that dies anywhere — preemption, peer-failure fail-fast
  from the coordination-service heartbeat, OOM — resumes by simply being
  rerun. Segmenting is exact: the LM loop's cross-iteration state is exactly
  (poses, points, lambda), so an interrupted run continues bit-for-bit
  (test_failure_recovery.py proves 5+5 == 10).

* :func:`auto_mesh` — rebuilds the data-parallel mesh from the devices that
  exist *now*. BA state is replicated (observations shard, poses/points
  psum), so any surviving subset of devices can continue from the checkpoint
  — the "resume on a shrunken mesh" story: detection crashes the job
  fail-fast, the supervisor (stepth_tpu.utils.supervisor) relaunches it on
  whatever is left, and solve_resumable picks up the state.

Together with :func:`stepth_tpu.utils.supervisor.supervise` this closes the
loop: heartbeat detects → process dies → supervisor relaunches → checkpoint
restores → solve continues (drilled end-to-end across real OS processes in
tests/test_failure_recovery.py and tests/test_multiprocess.py).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from stepth_tpu.fusion import ba
from stepth_tpu.utils import checkpoint


def auto_mesh(n_obs: int, devices=None) -> Optional[Mesh]:
    """A (data,)-axis mesh over the devices available *right now*, shrunk to
    the largest device count that divides ``n_obs`` (solve_sharded shards
    observations evenly). Returns ``None`` when only one device is usable —
    the caller should fall back to the single-device solver."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    while n > 1 and n_obs % n != 0:
        n -= 1
    if n <= 1:
        return None
    return Mesh(np.array(devs[:n]).reshape(1, n), ("_r", "data"))


def _problem_fingerprint(problem: ba.BAProblem):
    """Identity of the observation set as ``(shape_fp, content_fp)``.

    ``shape_fp`` covers shapes/dtypes and is always computable.
    ``content_fp`` hashes the (cam_idx, pt_idx, uv, weight, intrinsics)
    bytes — but only when every array is fully addressable: a multi-process
    global array cannot be materialized host-side (``np.asarray`` raises),
    and hashing a local shard would make the fingerprint topology-dependent
    (a survivor resuming on a shrunken mesh must still match the checkpoint
    its larger-topology run wrote). Poses/points are the *state* being
    optimized so they are excluded — the fingerprint must stay fixed across
    segments of one solve."""
    import hashlib

    obs = (
        problem.cam_idx,
        problem.pt_idx,
        problem.uv,
        problem.weight,
        problem.intrinsics,
    )
    hs = hashlib.sha256()
    hs.update(f"{problem.poses.shape}|{problem.points.shape}".encode())
    for arr in obs:
        hs.update(f"{arr.shape}|{jnp.asarray(arr).dtype}".encode())
    shape_fp = hs.hexdigest()[:16]
    if any(
        not getattr(arr, "is_fully_addressable", True) for arr in obs
    ):
        return shape_fp, None
    hc = hashlib.sha256()
    for arr in obs:
        hc.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
    return shape_fp, hc.hexdigest()[:16]


def solve_resumable(
    problem: ba.BAProblem,
    ckpt_path: str,
    iters: int = 10,
    cg_iters: int = 10,
    every: int = 5,
    mesh: Optional[Mesh] = None,
    lm_lambda0: float = 1e-3,
    fix_first_cam: bool = True,
    loss: str = "l2",
    loss_delta: float = 4.0,
    on_segment: Optional[Callable[[int, ba.BAState], None]] = None,
) -> ba.BAState:
    """Checkpointed LM solve that survives its process dying at any point.

    Runs ``iters`` LM iterations in segments of ``every``; after each segment
    the full iteration state is written to ``ckpt_path`` with the completed
    iteration count. If ``ckpt_path`` already holds a checkpoint for this run,
    the solve resumes from it instead of starting over — rerunning the same
    call after ANY interruption continues the same trajectory (bit-for-bit on
    the same mesh; to float tolerance across a mesh change, because psum
    partial-sum order shifts with the shard count).

    ``mesh=None`` uses the single-device solver; pass :func:`auto_mesh`'s
    result (rebuilt at process start) to shard over whatever devices survive.
    ``on_segment(done_iters, state)`` is a progress hook (metrics, extra
    persistence); exceptions it raises propagate after the checkpoint is
    written, so even a crashing hook never loses progress.
    """
    if every <= 0:
        raise ValueError(f"every must be positive, got {every}")
    like = {
        "poses": problem.poses,
        "points": problem.points,
        "lm": jnp.float32(0),
        "cost": jnp.float32(0),
    }
    shape_fp, content_fp = _problem_fingerprint(problem)
    start, lm = 0, lm_lambda0
    state: Optional[ba.BAState] = None
    meta = checkpoint.metadata(ckpt_path)
    # Resume only a checkpoint written for THIS problem: a stale file from a
    # different problem at the same path (matching iter counts) must not be
    # silently restored. Shapes must always match; content hashes are
    # compared when both sides have one (a multi-process run cannot compute
    # one — see _problem_fingerprint — so a survivor resuming its own
    # checkpoint on a shrunken mesh still matches on shapes). Old
    # checkpoints without a fingerprint are rejected (restart is always
    # correct; wrong-state resume never is).
    stored_content = (meta or {}).get("fp_content")
    if (
        meta is not None
        and meta.get("total_iters") == iters
        and meta.get("fp_shape") == shape_fp
        and (
            stored_content is None
            or content_fp is None
            or stored_content == content_fp
        )
    ):
        try:
            saved = checkpoint.restore(ckpt_path, like=like)
        except Exception:
            saved = None  # truncated/corrupt checkpoint → restart from scratch
        if saved is not None:
            start = int(meta["iter"])
            lm = float(np.asarray(saved["lm"]))
            problem = problem._replace(
                poses=jnp.asarray(saved["poses"]), points=jnp.asarray(saved["points"])
            )
            state = ba.BAState(
                poses=problem.poses,
                points=problem.points,
                cost=jnp.asarray(saved["cost"]),
                lm_lambda=jnp.float32(lm),
            )

    kw = dict(
        cg_iters=cg_iters,
        fix_first_cam=fix_first_cam,
        loss=loss,
        loss_delta=loss_delta,
    )
    for seg_start in range(start, iters, every):
        n = min(every, iters - seg_start)
        if mesh is None:
            state = ba.solve(problem, iters=n, lm_lambda0=lm, **kw)
        else:
            state = ba.solve_sharded(problem, mesh, iters=n, lm_lambda0=lm, **kw)
        problem = problem._replace(poses=state.poses, points=state.points)
        lm = float(np.asarray(state.lm_lambda))
        done = seg_start + n
        checkpoint.save(
            ckpt_path,
            {
                "poses": state.poses,
                "points": state.points,
                "lm": state.lm_lambda,
                "cost": state.cost,
            },
            metadata={
                "iter": done,
                "total_iters": iters,
                "n_devices": 1 if mesh is None else int(mesh.devices.size),
                "fp_shape": shape_fp,
                "fp_content": content_fp,
            },
        )
        if on_segment is not None:
            on_segment(done, state)
    assert state is not None  # start == iters only with a complete checkpoint
    return state
