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
from typing import List, Optional

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


def _refine_level(
    left_g,
    right_g,
    prior,
    cfg: MatchConfig,
    radius: int,
    max_base: Optional[int] = None,
    max_windows: int = 1,
    tile_rows: int = 32,
):
    """Refine ``prior`` disparity on one level within per-tile base windows.

    Round-5 rewrite (VERDICT r4 weak #2): the old per-pixel formulation
    sampled the right image at ``x − (round(prior(x)) + o)`` and then
    box-aggregated over the *offset* axis — but neighbouring pixels carry
    different bases, so each offset layer mixed different absolute
    disparities inside one aggregation window. On slanted/curved surfaces
    and at depth edges that smears the cost and biases the WTA, which is
    exactly why this backend sat ~10× behind the Pallas flagship on bad1
    (docs/ACCURACY_VGA.md round-4 rows). This version ports the flagship's
    plan: disparity bases are constant per (tile_rows × 128) tile
    (:func:`stepth_tpu.match.pallas_refine.tile_windows_from_prior` — the
    same greedy multi-window interval cover), so aggregation is
    disparity-consistent everywhere except tile borders, matching the Pallas
    kernel's contract. Tie-breaks mirror the kernel: windows run in plan
    order, offsets in ascending order, strict-< first-win; subpixel pairs
    only within one window.

    The cost is one gather per (window, offset) candidate — XLA routes these
    through the scalar core, which is why this stays the portable/debug twin
    and the Pallas kernel the production path."""
    from stepth_tpu.match import pallas_refine

    h, w = left_g.shape
    if max_base is None:
        max_base = w - 1
    tw = 128
    hp = -(-h // tile_rows) * tile_rows
    wp = -(-w // tw) * tw
    prior_p = jnp.pad(prior, ((0, hp - h), (0, wp - w)), mode="edge")
    # tile_windows_from_prior's output contract: K = 2 when the effective cap
    # is <= 1 (a never-run second slot), else the cap — which it clamps to
    # the provable maximum cover size ceil((max_base+1)/(2R+1))
    mw_eff = min(max_windows, -(-(max_base + 1) // (2 * radius + 1)))
    K = 2 if mw_eff <= 1 else mw_eff
    kidx = jnp.arange(K)[None, None, :]
    # Four shifted tilings: pixels within the box-window radius of a tile
    # border aggregate costs across a base change (the Pallas kernel avoids
    # this with constant-base margins); tilings shifted by half a tile in
    # column, row, and both make every pixel fully interior in exactly one.
    # Each tiling competes ONLY for pixels interior to its own grid — a
    # global min would let a spuriously-low mixed-base cost from another
    # tiling's border band steal wins (measured: bad1 got worse, not
    # better). Row shifts matter whenever disparity varies with y (curved /
    # fronto-stack scenes); column shifts whenever it varies with x.
    rbox = cfg.window // 2
    sr, sc_ = tile_rows // 2, tw // 2
    xr = jnp.arange(w, dtype=jnp.int32)[None, :]
    yr = jnp.arange(h, dtype=jnp.int32)[:, None]
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    no = 2 * radius + 1
    big = jnp.float32(1e30)

    # Per tiling: one gather + one box aggregate over all K·(2R+1)
    # candidates, then a vectorized first-win WTA — jnp.argmin returns the
    # FIRST minimum, which is exactly the sequential (window, offset)
    # tie-break order of the Pallas kernel (an unrolled where-chain compiled
    # ~40x slower on CPU). Subpixel neighbours live at candidate index ±1 and
    # share a window iff the winning offset is interior.
    merged = None
    for dy, dx in ((0, 0), (0, sc_), (sr, 0), (sr, sc_)):
        pp = jnp.pad(prior_p, ((dy, dy), (dx, dx)), mode="edge")
        if (dy or dx) and (pp.shape[0] % tile_rows or pp.shape[1] % tw):
            pp = jnp.pad(
                pp,
                (
                    (0, -pp.shape[0] % tile_rows),
                    (0, -pp.shape[1] % tw),
                ),
                mode="edge",
            )
        b_t, nw_t = pallas_refine.tile_windows_from_prior(
            pp, tile_rows, max_base, radius, max_windows
        )
        # windows beyond a tile's plan duplicate window 0: strict-< first-win
        # WTA makes later duplicates harmless
        b_t = jnp.where(kidx < nw_t[..., None], b_t, b_t[..., :1])
        B = jnp.repeat(jnp.repeat(b_t, tile_rows, 0), tw, 1)[
            dy : dy + h, dx : dx + w
        ]  # [h, w, K]
        near_c = ((xr + dx) % tw < rbox) | ((xr + dx) % tw >= tw - rbox)
        near_r = ((yr + dy) % tile_rows < rbox) | (
            (yr + dy) % tile_rows >= tile_rows - rbox
        )
        not_owner = near_c | near_r  # [h, w]

        # candidate disparities s = B[..., wi] + o, flattened (wi, o)
        svals = (B[..., None] + offs[None, None, None, :]).reshape(h, w, K * no)
        xs = x[..., None] - svals
        inb = (xs >= 0) & (xs < w)
        xs = jnp.clip(xs, 0, w - 1)
        r_samp = jnp.take_along_axis(right_g[:, :, None], xs, axis=1)
        cost = jnp.abs(left_g[..., None] - r_samp)
        cost = jnp.where(inb, cost, 1e6)
        agg = dense.box_aggregate(cost, cfg.window)  # [h, w, K*no]
        agg = jnp.where(not_owner[..., None], big, agg)

        i0 = jnp.argmin(agg, axis=-1)  # first minimum = plan-order tie-break
        take = lambda idx: jnp.take_along_axis(  # noqa: E731
            agg, idx[..., None], axis=-1
        )[..., 0]
        cb = take(i0)
        oi = i0 % no
        interior = (oi >= 1) & (oi <= no - 2)
        cm1 = take(jnp.maximum(i0 - 1, 0))
        cp1 = take(jnp.minimum(i0 + 1, K * no - 1))
        s_win = jnp.take_along_axis(svals, i0[..., None], axis=-1)[
            ..., 0
        ].astype(jnp.float32)
        cand = (cb, cm1, cp1, s_win, interior)
        if merged is None:
            merged = cand
        else:
            upd = cand[0] < merged[0]  # earlier tilings win ties
            merged = tuple(
                jnp.where(upd, n, o) for n, o in zip(cand, merged)
            )

    cb, cm1, cp1, bestd, interior = merged
    denom = cm1 - 2.0 * cb + cp1
    delta = jnp.where(jnp.abs(denom) > 1e-6, (cm1 - cp1) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    if not cfg.subpixel:
        interior = jnp.zeros_like(interior)
    new_disp = jnp.where(interior, bestd + delta, bestd)
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
    max_base = pyr.coarsest_disparities
    for lvl in range(pyr.levels - 2, -1, -1):
        h, w = lefts[lvl].shape
        prior = upsample2_disparity(disp, h, w)
        max_base = max_base * 2
        r_lvl = pyr.final_radius if lvl == 0 else pyr.refine_radius
        nw_lvl = pyr.final_windows if lvl == 0 else pyr.refine_windows
        disp = _refine_level(
            lefts[lvl], rights[lvl], prior, cfg, r_lvl,
            max_base=max_base, max_windows=nw_lvl,
        )

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
