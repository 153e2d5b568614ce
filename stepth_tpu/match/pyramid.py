"""Coarse-to-fine hierarchical matcher.

TPU recast of disage's adaptive subdivision (reference src/depth_image.rs:104-109
and SURVEY.md §2.1 C7): instead of data-dependent recursive splits, a fixed-depth
image pyramid. The coarsest level runs the full dense matcher
(stepth_tpu/match/dense.py) over a small disparity range; each finer level
refines the 2×-upsampled estimate within ``±refine_radius`` — so per-level work
is O(H·W·(2R+1)) instead of O(H·W·D), and the sharding halo is bounded by the
refine radius instead of the full search range (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp

from stepth_tpu.config import MatchConfig, PyramidConfig
from stepth_tpu.match import dense


def downsample2(gray: jax.Array) -> jax.Array:
    """2×2 average pool (odd trailing row/col dropped) via strided adds.

    The obvious ``reshape(h2, 2, w2, 2).mean((1, 3))`` lowers to a relayout
    that costs ~2 ms per 1080p chain on a v5e — more than half the whole
    hierarchical matcher; the strided-slice adds fuse to effectively zero
    (measured ≲ 0.05 ms for the 3-level chain)."""
    h, w = gray.shape
    h2, w2 = h // 2, w // 2
    g = gray[: h2 * 2, : w2 * 2]
    v = g[0::2] + g[1::2]
    return (v[:, 0::2] + v[:, 1::2]) * 0.25


def upsample2_disparity(disp: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest-neighbor 2× upsample of a disparity map to (h, w); disparity
    values double because pixel coordinates double."""
    up = jnp.repeat(jnp.repeat(disp, 2, axis=0), 2, axis=1) * 2.0
    # pad/crop to the exact target dims (odd sizes)
    up = up[:h, :w]
    ph, pw = h - up.shape[0], w - up.shape[1]
    if ph or pw:
        up = jnp.pad(up, ((0, ph), (0, pw)), mode="edge")
    return up


def _refine_level(left_g, right_g, prior, cfg: MatchConfig, radius: int):
    """Refine ``prior`` disparity on one level within ±radius.

    Cost for offset o is |L(x) − R(x − (prior(x) + o))| box-aggregated; the
    sample position is data-dependent so this is a gather over W — the offsets
    axis (2R+1) is innermost."""
    h, w = left_g.shape
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)  # [K]
    base = jnp.round(prior).astype(jnp.int32)  # integer prior
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    # sample index per offset: x - (base + o)
    xs = x[..., None] - (base[..., None] + offs.astype(jnp.int32)[None, None, :])
    inb = (xs >= 0) & (xs < w)
    xs = jnp.clip(xs, 0, w - 1)
    r_samp = jnp.take_along_axis(
        right_g[:, :, None], jnp.broadcast_to(xs, (h, w, offs.shape[0])), axis=1
    )
    cost = jnp.abs(left_g[..., None] - r_samp)
    cost = jnp.where(inb, cost, 1e6)
    agg = dense.box_aggregate(cost, cfg.window)
    delta, _, _ = dense.wta(agg, subpixel=cfg.subpixel, uniqueness=None)
    new_disp = base.astype(jnp.float32) + (delta - float(radius))
    return jnp.clip(new_disp, 0.0, float(w - 1))


@partial(jax.jit, static_argnames=("cfg", "pyr", "coarse_backend", "sgm"))
def match_hierarchical(
    left,
    right,
    cfg: MatchConfig = MatchConfig(),
    pyr: PyramidConfig = PyramidConfig(),
    coarse_backend: str = "wta",
    sgm=None,
) -> dense.MatchResult:
    """Hierarchical dense match of a rectified pair. Equivalent output contract
    to :func:`stepth_tpu.match.dense.match_pair` but with cost bounded per level;
    the effective search range is ``coarsest_disparities × 2^(levels-1)``.

    ``coarse_backend="sgm"`` runs the semi-global matcher at the coarsest
    level (knobs via ``sgm``: an :class:`stepth_tpu.match.sgm.SGMConfig`) —
    the XLA twin of the Pallas flagship's SGM-coarse hybrid
    (:func:`stepth_tpu.match.pallas_refine.match_hierarchical_pallas`)."""
    lg = dense.grayscale(left)
    rg = dense.grayscale(right)

    lefts: List[jax.Array] = [lg]
    rights: List[jax.Array] = [rg]
    for _ in range(pyr.levels - 1):
        lefts.append(downsample2(lefts[-1]))
        rights.append(downsample2(rights[-1]))

    coarse_cfg = MatchConfig(
        num_disparities=pyr.coarsest_disparities,
        window=cfg.window,
        cost=cfg.cost,
        census_window=cfg.census_window,
        subpixel=cfg.subpixel,
        lr_threshold=cfg.lr_threshold,
        uniqueness=cfg.uniqueness,
    )
    if coarse_backend == "wta":
        res = dense.match_pair(lefts[-1], rights[-1], coarse_cfg)
    elif coarse_backend == "sgm":
        from stepth_tpu.match import sgm as sgm_mod

        res = sgm_mod.match_pair_sgm(
            lefts[-1],
            rights[-1],
            coarse_cfg,
            sgm_mod.SGMConfig() if sgm is None else sgm,
        )
    else:
        raise ValueError(
            f"coarse_backend must be 'wta' or 'sgm', got {coarse_backend!r}"
        )
    disp = res.disparity
    for lvl in range(pyr.levels - 2, -1, -1):
        h, w = lefts[lvl].shape
        prior = upsample2_disparity(disp, h, w)
        disp = _refine_level(lefts[lvl], rights[lvl], prior, cfg, pyr.refine_radius)

    disp = dense.median3(disp)
    # Propagate the coarse level's LR/uniqueness validity to full resolution
    # (nearest-neighbor ×2 per level). The refine levels have no right-view
    # pass of their own, so this is coarse-granularity occlusion flagging —
    # the Pallas flagship's in-kernel right-view WTA (`lr_check=True`) is the
    # full-resolution version. Previously this mask was computed at the
    # coarsest level and then discarded (`valid = disp >= 0`, identically
    # true), so the backend reported every occluded pixel as valid.
    v = res.valid
    for lvl in range(pyr.levels - 2, -1, -1):
        h, w = lefts[lvl].shape
        v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1)
        v = jnp.pad(
            v, ((0, max(0, h - v.shape[0])), (0, max(0, w - v.shape[1]))),
            mode="edge",
        )[:h, :w]
    valid = v & (disp >= 0)
    return dense.MatchResult(disparity=disp, valid=valid, cost=jnp.zeros_like(disp))
