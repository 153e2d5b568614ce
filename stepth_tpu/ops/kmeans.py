"""1-D k-means depth segmentation (reference ``depth_split``,
src/depth_image.rs:162-218).

Depth is u8, so Lloyd's iteration runs **exactly** on a 256-bin histogram inside a
``lax.while_loop`` (SURVEY.md §2.2): the only per-pixel work is one ``bincount``.
Centers live in a fixed 256-slot sorted vector (sentinel-padded), sidestepping the
data-dependent center count (the reference's initial center count is whatever
``range(min, max, step)`` yields, not necessarily ``zones``).

Normative decisions (docs/SEMANTICS.md §7): assignment ties go to the smaller
center (Rust ``min_by`` keeps the first minimum over the ascending-sorted vector);
update is the floor integer mean with empty -> 0 (reference ``max(1)`` guard :187);
equal centers merge (the reference's HashMap-keyed clusters); convergence compares
the sorted deduped center vector; quirk Q5's ``step <= 0`` panic becomes
``step = max(step, 1)`` and a constant plane returns its single degenerate cluster.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SLOTS = 256
_SENTINEL = 1 << 20
_MAX_ITERS = 300


@jax.jit
def _histogram(depth) -> jnp.ndarray:
    return jnp.bincount(jnp.asarray(depth, dtype=jnp.uint8).ravel(), length=256)


def _dedupe_sorted(centers: jnp.ndarray) -> jnp.ndarray:
    """Replace duplicates in an ascending sentinel-padded vector with sentinels,
    then re-sort (keeps one copy of each value)."""
    prev = jnp.concatenate([jnp.array([-1], dtype=centers.dtype), centers[:-1]])
    distinct = centers != prev
    return jnp.sort(jnp.where(distinct, centers, _SENTINEL))


def _lloyd_step(hist: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """One assignment+update round on the histogram. centers: int32[_SLOTS],
    ascending, deduped, sentinel-padded."""
    bins = jnp.arange(256, dtype=jnp.int32)
    active = centers < _SENTINEL
    dist = jnp.abs(centers[None, :] - bins[:, None])
    dist = jnp.where(active[None, :], dist, _SENTINEL)
    assign = jnp.argmin(dist, axis=1)  # first minimum = smaller center on ties
    onehot = jax.nn.one_hot(assign, _SLOTS, dtype=jnp.int32)  # [256 bins, slots]
    counts = (hist.astype(jnp.int32)[:, None] * onehot).sum(axis=0)
    sums = ((hist * bins).astype(jnp.int32)[:, None] * onehot).sum(axis=0)
    means = sums // jnp.maximum(counts, 1)  # empty cluster -> 0 (reference :187)
    new_centers = jnp.where(active, means, _SENTINEL)
    # means are NOT monotone in slot order (an emptied cluster maps to 0, and
    # updates can reorder/collide centers); sort before the adjacent-dedupe or
    # equal centers fail to merge (found by hypothesis: depth {0,5,11,27},
    # zones=4 — the emptied slot's 0 collided with center 0 non-adjacently)
    return _dedupe_sorted(jnp.sort(new_centers))


@jax.jit
def _run_lloyd(hist: jnp.ndarray, init_centers: jnp.ndarray):
    init = _dedupe_sorted(init_centers)

    def cond(state):
        centers, prev, it = state
        return (it < _MAX_ITERS) & jnp.any(centers != prev)

    def body(state):
        centers, _, it = state
        return _lloyd_step(hist, centers), centers, it + 1

    first = _lloyd_step(hist, init)
    centers, _, _ = jax.lax.while_loop(cond, body, (first, init, jnp.int32(1)))

    # Final assignment -> per-cluster (min, max) over populated bins.
    bins = jnp.arange(256, dtype=jnp.int32)
    active = centers < _SENTINEL
    dist = jnp.abs(centers[None, :] - bins[:, None])
    dist = jnp.where(active[None, :], dist, _SENTINEL)
    assign = jnp.argmin(dist, axis=1)
    onehot = jax.nn.one_hot(assign, _SLOTS, dtype=jnp.bool_)
    member = onehot & (hist > 0)[:, None]
    big = jnp.int32(256)
    mins = jnp.min(jnp.where(member, bins[:, None], big), axis=0)
    maxs = jnp.max(jnp.where(member, bins[:, None], -1), axis=0)
    return centers, mins, maxs


def depth_split(depth, zones: int) -> List[Tuple[Optional[int], Optional[int]]]:
    """Cluster the depth plane into ``zones`` 1-D k-means clusters; returns
    (min, max) per final cluster in ascending center order
    (reference src/depth_image.rs:162-218)."""
    if zones < 2:
        return [(None, None)]  # reference :163-164
    hist = np.asarray(_histogram(depth))
    populated = np.nonzero(hist)[0]
    img_min, img_max = int(populated[0]), int(populated[-1])
    if img_min == img_max:
        # reference panics (step 0, quirk Q5); defined: single degenerate cluster
        return [(img_min, img_max)]
    step = max((img_max - img_min) // (zones - 1) - 1, 1)  # Q5 guard
    init = list(range(img_min, img_max, step))  # excludes img_max (reference :214)
    init_arr = np.full(_SLOTS, _SENTINEL, dtype=np.int32)
    init_arr[: len(init)] = init[:_SLOTS]
    centers, mins, maxs = _run_lloyd(jnp.asarray(hist), jnp.asarray(init_arr))
    centers, mins, maxs = np.asarray(centers), np.asarray(mins), np.asarray(maxs)
    out: List[Tuple[Optional[int], Optional[int]]] = []
    for k in range(_SLOTS):
        if centers[k] >= _SENTINEL:
            break
        if mins[k] > 255:  # empty final cluster: reference panics; defined (None, None)
            out.append((None, None))
        else:
            out.append((int(mins[k]), int(maxs[k])))
    return out
