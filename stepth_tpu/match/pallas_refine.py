"""Pallas refine kernel: hierarchical matching without gathers.

The XLA pyramid refiner (`pyramid._refine_level`) samples the right image at
``x − (prior(x) + o)`` — a per-pixel gather, which routes through the TPU
scalar core (~500 ms per 1080p level). This kernel replaces it with a
**per-column-tile base disparity**: the prior is reduced to one integer per
(row-tile × 128-lane column tile), and within a tile the candidate disparities
``base + o, o ∈ [−R, R]`` become *rolls* of a VMEM-resident right-image block.
Column tiles are processed in a ``fori_loop`` with 128-aligned dynamic slices,
so Mosaic sees only aligned vector ops.

Contract difference vs the XLA refiner: disparity candidates are quantized per
column tile instead of per pixel. Tiles whose prior spread fits one ``base ± R``
window run exactly that window (bit-identical to the round-2 single-base
kernel); tiles crossing a disparity discontinuity — where one base would
misassign a 128-px band (round-2 VERDICT weak #2) — run up to ``max_windows``
base windows interpolated between the tile's prior min and max, with a single
WTA merged across windows. Smooth scenes pay nothing; edge tiles pay one extra
pre-roll + (2R+1) candidates per extra window, only where the prior demands it.

Coordinate scheme (per column tile ``jc``; lane-tile = 128, margin ``M``):
  cost region: real cols xc ∈ [jc·128 − M, jc·128 − M + CW), CW = 256
    (output columns live at cost cols [M, M+128); M ≥ 2·(win//2) keeps the
    box-sum wrap pollution of the mod-CW rolls outside the used span)
  left block:  l_slab[:, lstart : lstart+CW], lstart = PADL + jc·128 − M —
    128-aligned because PADL ≡ M (mod 128)
  right block: one 128-aligned dynamic slice [rb0, rb0+BW2) with
    rb0 = lstart − A, A = round_up(base + R, 128); candidate s = base + o
    then satisfies  r(xc − s) = rblock[q + A − s]  with q + A − s always in
    [0, BW2) — so ONE dynamic pre-roll by (base − R − A) brings offset −R to
    block position 0, and every further offset is a static roll by +1
    (incremental across the offset loop; wrapped lanes are never read).

This replaces the previous formulation (CW = 384 cost regions + a 640..768-
wide dynamic roll *per offset*), cutting the vector work per output pixel
~1.6× (measured: refine level 0 at 1080p 1.48 → 0.9 ms class).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stepth_tpu.config import MatchConfig, PyramidConfig
from stepth_tpu.match import dense, pallas_dense
from stepth_tpu.match.sgm import SGMConfig

_BIG = 1e30
_TW = 128  # lane-tile column width
_CW = 256  # cost-region width
_BW2 = 512  # right-block width (CW + 128 alignment slack + 2R headroom)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _refine_kernel(
    bases_ref,  # SMEM i32[nr, nc, K] window-base disparities per tile
    nw_ref,  # SMEM i32[nr, nc] number of base windows to run (1..K)
    g_row0_ref,  # SMEM i32[1] global row of input row 0 (for row shards)
    l_hbm,
    r_hbm,  # ANY f32[Hp, Wp] (left-padded by PADL, right by PADR)
    *out_refs,  # disp_ref [+ dispr_ref when lr]: VMEM f32[TH, Wout]
    Hp,
    Wp,
    Hr,
    Wr,  # real (unpadded) dims
    TH,
    RV,
    win,
    R,
    M,
    PADL,
    PADB,
    nc,
    K=1,  # static cap on base windows (bases_ref's last dim)
    g_h=None,
    nplanes=0,
    squared=False,
    lr=False,
):
    disp_ref = out_refs[0]
    dispr_ref = out_refs[1] if lr else None
    if g_h is None:
        g_h = Hr
    g_row0 = g_row0_ref[0]
    S = TH + 2 * RV
    i = pl.program_id(0)
    # caller pads the input with RV rows top and bottom → slabs are interior
    start = pl.multiple_of(i * TH, 8)
    rbox = win // 2
    # right-view scratch coordinate: g = u + PADB + M (u = real right col)
    Wscr = PADB + ((nc * _TW + M + _BW2 - _CW + 127) // 128) * 128

    def body(
        l_slab,
        r_slab,
        sem_l,
        sem_r,
        best_s,
        bests_s,
        oi_s,
        wbest_s,
        cm1_s,
        cb_s,
        cp1_s,
        rbest=None,
        rarg=None,
    ):
        if nplanes:
            src_l = l_hbm.at[:, pl.ds(start, S)]
            src_r = r_hbm.at[:, pl.ds(start, S)]
        else:
            src_l = l_hbm.at[pl.ds(start, S)]
            src_r = r_hbm.at[pl.ds(start, S)]
        cp_l = pltpu.make_async_copy(src_l, l_slab, sem_l)
        cp_r = pltpu.make_async_copy(src_r, r_slab, sem_r)
        cp_l.start()
        cp_r.start()
        cp_l.wait()
        cp_r.wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        ccols = jax.lax.broadcasted_iota(jnp.int32, (1, _CW), 1)  # cost cols

        # stage-0 row zero-mask (out-of-image rows contribute nothing); box
        # rolls are then unmasked (interior slabs, RV ≥ rbox+1; horizontal
        # wrap pollution stays outside the used span because M ≥ 2·rbox)
        lrow = start + rows - RV  # local (unpadded-input) row of slab row k
        vz = (lrow >= 0) & (lrow < Hr)
        gr = g_row0 + lrow
        vz &= (gr >= 0) & (gr < g_h)
        vzero = vz.astype(jnp.float32)

        def vert_box(cost):
            if win == 9:  # two-stage 3×3: 4 rolls
                y = cost
                for sh in (1, S - 1):
                    y = y + pltpu.roll(cost, sh, axis=0)
                z = y
                for sh in (3, S - 3):
                    z = z + pltpu.roll(y, sh, axis=0)
                return z
            z = jnp.zeros_like(cost)
            for j in range(-rbox, rbox + 1):
                z = z + pltpu.roll(cost, (-j) % S, axis=0)
            return z

        def horiz_box(v):  # on the extracted [TH, CW] rows
            if win == 9:
                y = v
                for sh in (1, _CW - 1):
                    y = y + pltpu.roll(v, sh, axis=1)
                z = y
                for sh in (3, _CW - 3):
                    z = z + pltpu.roll(y, sh, axis=1)
                return z
            z = jnp.zeros_like(v)
            for m in range(-rbox, rbox + 1):
                z = z + pltpu.roll(v, (-m) % _CW, axis=1)
            return z

        def col_tile(jc, _):
            nw_t = nw_ref[i, jc]
            lstart = pl.multiple_of(PADL + jc * _TW - M, 128)
            if nplanes:
                lblocks = [l_slab[p, :, pl.ds(lstart, _CW)] for p in range(nplanes)]
            else:
                lblock = l_slab[:, pl.ds(lstart, _CW)]  # [S, CW]

            # real col of cost position q: xc = jc*TW - M + q
            x_real = jc * _TW - M + ccols  # [1, CW]
            # offset-independent zero mask (out-of-image rows/cols)
            zmask = vzero * ((x_real >= 0) & (x_real < Wr)).astype(jnp.float32)
            if lr:
                colbad = (x_real < 0) | (x_real >= Wr)  # [1, CW]

            # WTA state lives in scratch so the statically-unrolled window
            # blocks (predicated with pl.when) can update it: a dynamic
            # fori_loop over windows compiles, but mixed per-tile trip counts
            # measured 40x slower than this unroll (268 vs ~5 ms at 1080p)
            best_s[:] = jnp.full((TH, _CW), _BIG, jnp.float32)
            bests_s[:] = jnp.zeros((TH, _CW), jnp.int32)  # winning disparity
            oi_s[:] = jnp.full((TH, _CW), -2, jnp.int32)  # winning offset
            wbest_s[:] = jnp.full((TH, _CW), -1, jnp.int32)  # winning window
            cm1_s[:] = jnp.zeros((TH, _CW), jnp.float32)  # cost at s-1
            cb_s[:] = jnp.full((TH, _CW), _BIG, jnp.float32)  # cost at s
            cp1_s[:] = jnp.full((TH, _CW), _BIG, jnp.float32)  # cost at s+1

            def window(wi):
                # placement comes precomputed from the host plan
                # (tile_windows_from_prior): a greedy +-R interval cover of
                # the tile's subtile prior means, already clipped to the
                # valid base range
                base_t = bases_ref[i, jc, wi]
                # alignment block for the dynamic right slice: A >= base+R
                A = (base_t + R + 127) // 128 * 128
                rb0 = pl.multiple_of(lstart - A, 128)
                if nplanes:
                    rolled = [
                        pltpu.roll(
                            r_slab[p, :, pl.ds(rb0, _BW2)],
                            (base_t - R - A) % _BW2,
                            axis=1,
                        )
                        for p in range(nplanes)
                    ]
                else:
                    # pre-roll so offset -R's sample sits at block position 0
                    rolled = pltpu.roll(
                        r_slab[:, pl.ds(rb0, _BW2)], (base_t - R - A) % _BW2, axis=1
                    )

                prev = jnp.zeros((TH, _CW), jnp.float32)
                if lr:
                    # right-view WTA in the shifting frame:
                    #   B_o[q] = min(contrib_o[q], B_{o-1}[q-1])
                    # so after the loop B[q] = min_o contrib_o[q - R + o]: the
                    # right-view cost at u = jc*128 - M + q - R - base for every
                    # o -- one static roll-by-1 per offset instead of a gather
                    bR = jnp.full((TH, _CW), _BIG, jnp.float32)
                    aR = jnp.full((TH, _CW), -1e6, jnp.float32)

                for o in range(-R, R + 1):
                    s = base_t + o  # candidate disparity (may be < 0 at base 0)
                    if o > -R:  # advance the incremental roll: position 0 <- s
                        if nplanes:
                            rolled = [pltpu.roll(rp, 1, axis=1) for rp in rolled]
                        else:
                            rolled = pltpu.roll(rolled, 1, axis=1)
                    if nplanes:
                        # census: hamming distance over u32 descriptor planes
                        ham = jnp.zeros((S, _CW), jnp.int32)
                        for p in range(nplanes):
                            ham = ham + jax.lax.population_count(
                                lblocks[p] ^ rolled[p][:, :_CW]
                            ).astype(jnp.int32)
                        cost = ham.astype(jnp.float32)
                    else:
                        diff = lblock - rolled[:, :_CW]
                        cost = diff * diff if squared else jnp.abs(diff)
                    xs = x_real - s  # sampled real col
                    bad = (xs < 0) | (xs >= Wr)
                    cost = jnp.where(bad, 1e6, cost)  # XLA refiner's inb mask
                    cost = cost * zmask

                    aggv = vert_box(cost)[RV : RV + TH]  # extract, then horiz
                    aggc = horiz_box(aggv)

                    oi = o + R
                    upd = aggc < best_s[:]
                    # subpixel neighbors only pair up within one window: cp1
                    # fires iff the reigning winner is this window's previous
                    # offset (ties across overlapping windows keep the first)
                    is_next = (
                        jnp.logical_not(upd)
                        & (wbest_s[:] == wi)
                        & (oi_s[:] == oi - 1)
                    )
                    cm1_s[:] = jnp.where(upd, prev, cm1_s[:])
                    cb_s[:] = jnp.where(upd, aggc, cb_s[:])
                    cp1_s[:] = jnp.where(is_next, aggc, cp1_s[:])
                    best_s[:] = jnp.where(upd, aggc, best_s[:])
                    bests_s[:] = jnp.where(upd, s, bests_s[:])
                    oi_s[:] = jnp.where(upd, oi, oi_s[:])
                    wbest_s[:] = jnp.where(upd, wi, wbest_s[:])
                    prev = aggc

                    if lr:
                        contrib = jnp.where(bad | colbad, _BIG, aggc)
                        bR_s = pltpu.roll(bR, 1, axis=1)
                        aR_s = pltpu.roll(aR, 1, axis=1)
                        updr = contrib < bR_s
                        bR = jnp.where(updr, contrib, bR_s)
                        aR = jnp.where(updr, jnp.float32(1.0) * s, aR_s)

                if lr:
                    # B[q] wraps contributions for q < 2R -- mask, then min this
                    # window's right-view band into the full-width scratch at
                    # its 128-aligned position g0 = jc*128 + PADB - A (scratch
                    # col g = u + PADB + M; the M offsets cancel -> g0 aligned)
                    bR_m = jnp.where(ccols < 2 * R, _BIG, bR)
                    padw = jnp.full((TH, _BW2 - _CW), _BIG, jnp.float32)
                    bRp = pltpu.roll(
                        jnp.concatenate([bR_m, padw], axis=1),
                        (A - base_t - R) % _BW2,
                        axis=1,
                    )
                    aRp = pltpu.roll(
                        jnp.concatenate([aR, padw], axis=1),
                        (A - base_t - R) % _BW2,
                        axis=1,
                    )
                    g0 = pl.multiple_of(jc * _TW + PADB - A, 128)
                    cur = rbest[:, pl.ds(g0, _BW2)]
                    take = bRp < cur
                    rbest[:, pl.ds(g0, _BW2)] = jnp.where(take, bRp, cur)
                    cura = rarg[:, pl.ds(g0, _BW2)]
                    rarg[:, pl.ds(g0, _BW2)] = jnp.where(take, aRp, cura)

            window(0)  # nw >= 1 always
            for wi in range(1, K):

                @pl.when(wi < nw_t)
                def _run(wi=wi):
                    window(wi)

            denom = cm1_s[:] - 2.0 * cb_s[:] + cp1_s[:]
            delta = jnp.where(
                jnp.abs(denom) > 1e-6, (cm1_s[:] - cp1_s[:]) / (2.0 * denom), 0.0
            )
            delta = jnp.clip(delta, -0.5, 0.5)
            interior = (oi_s[:] >= 1) & (oi_s[:] <= 2 * R - 1)
            dval = bests_s[:].astype(jnp.float32)
            dval = jnp.where(interior, dval + delta, dval)
            dval = jnp.clip(dval, 0.0, float(Wr - 1))
            disp_ref[:, pl.ds(jc * _TW, _TW)] = dval[:, M : M + _TW]
            return 0

        if lr:
            rbest[:] = jnp.full((TH, Wscr), _BIG, jnp.float32)
            rarg[:] = jnp.full((TH, Wscr), -1e6, jnp.float32)
        jax.lax.fori_loop(0, nc, col_tile, 0)

        if lr:
            # read the right-view disparity back out: u = jc·128 + k →
            # scratch col jc·128 + PADB + M + k (window start aligned at
            # jc·128 + PADB, static sub-slice [M, M+TW))
            def emit_r(jc, _):
                win_r = rarg[:, pl.ds(jc * _TW + PADB, 2 * _TW)]
                dispr_ref[:, pl.ds(jc * _TW, _TW)] = win_r[:, M : M + _TW]
                return 0

            jax.lax.fori_loop(0, nc, emit_r, 0)

    slab_ty = (
        pltpu.VMEM((nplanes, S, Wp), jnp.uint32)
        if nplanes
        else pltpu.VMEM((S, Wp), jnp.float32)
    )
    wta_f = pltpu.VMEM((TH, _CW), jnp.float32)
    wta_i = pltpu.VMEM((TH, _CW), jnp.int32)
    scoped = dict(
        l_slab=slab_ty,
        r_slab=slab_ty,
        sem_l=pltpu.SemaphoreType.DMA,
        sem_r=pltpu.SemaphoreType.DMA,
        best_s=wta_f,
        bests_s=wta_i,
        oi_s=wta_i,
        wbest_s=wta_i,
        cm1_s=wta_f,
        cb_s=wta_f,
        cp1_s=wta_f,
    )
    if lr:
        scoped["rbest"] = pltpu.VMEM((TH, Wscr), jnp.float32)
        scoped["rarg"] = pltpu.VMEM((TH, Wscr), jnp.float32)
    pl.run_scoped(body, **scoped)


def tile_base_from_prior(prior, tile_rows: int, max_base: int):
    """Per-(row-tile, col-tile) integer base disparity: the rounded tile mean
    of the prior, clamped to [0, max_base]. prior f32[hp, wp] (padded dims)."""
    hp, wp = prior.shape
    nr, nc = hp // tile_rows, wp // _TW
    t = prior.reshape(nr, tile_rows, nc, _TW).mean(axis=(1, 3))
    return jnp.clip(jnp.round(t), 0, max_base).astype(jnp.int32)


def tile_windows_from_prior(
    prior, tile_rows: int, max_base: int, radius: int, max_windows: int
):
    """Adaptive per-tile search-window plan: ``(bases, nw)`` with ``bases``
    i32[nr, nc, max_windows] window-base disparities and ``nw`` i32[nr, nc]
    the number to run.

    Tiles whose prior spread fits one ``mean ± radius`` window get ``nw=1,
    bases[0]=round(mean)`` — the exact round-2 single-base plan, so smooth
    regions stay bit-identical and pay one window. For tiles spanning a
    disparity discontinuity, the coverage targets are the tile's 8×8-subtile
    prior means — the actual disparity mass, robust to per-pixel prior noise
    (σ/8 after 64-px averaging) while pure-surface subtiles keep their mode's
    value — and window bases are a greedy interval cover of those targets:
    repeatedly center a ``± radius`` window on the lowest uncovered group
    (optimal for interval covering). A bimodal depth-edge tile therefore gets
    one window per surface mode, and an extreme unimodal ramp gets windows
    tiled across its span, up to the ``max_windows`` cap."""
    hp, wp = prior.shape
    nr, nc = hp // tile_rows, wp // _TW
    t = prior.reshape(nr, tile_rows, nc, _TW)
    mean = t.mean(axis=(1, 3))
    b_mean = jnp.clip(jnp.round(mean), 0, max_base).astype(jnp.int32)
    # The greedy ±radius interval cover of targets in [0, max_base] can never
    # need more than ceil((max_base+1)/(2·radius+1)) windows (consecutive
    # greedy centers are > 2·radius apart), so slots beyond that bound are
    # provably dead — dropping them shrinks the kernel's static window unroll
    # (a compile-size lever: K=16 at every level of every small test config
    # pushed XLA's CPU backend into a compiler segfault) with zero semantic
    # change.
    max_windows = min(max_windows, -(-(max_base + 1) // (2 * radius + 1)))
    if max_windows <= 1:
        # K=2 with nw=1: the second slot never runs. NOTE: must be
        # broadcast_to, not stack([b, b]) — a duplicated-operand stack feeding
        # the SMEM operand compiled ~200x slower on TPU (measured 915 vs
        # 4.7 ms at 1080p; XLA folds it into a layout the Mosaic scalar
        # loads handle pathologically)
        bases = jnp.broadcast_to(b_mean[..., None], (*b_mean.shape, 2))
        return bases, jnp.ones_like(b_mean)
    # 8×8 subtile means via an avg-pool: reduce_window lowers to the TPU's
    # native pooling. The previous 6-D reshape+mean split the 128-lane dim
    # 16×8, forcing a relayout that cost ~0.38 ms per level at 1080p — the
    # entire "multi-window overhead" on smooth scenes was this planning op,
    # not the (pl.when-skipped) kernel windows (tools/refine_frontier.py).
    pooled = jax.lax.reduce_window(
        prior, 0.0, jax.lax.add, (8, 8), (8, 8), "VALID"
    ) * (1.0 / 64.0)
    sub = pooled.reshape(nr, tile_rows // 8, nc, _TW // 8)
    sub = sub.transpose(0, 2, 1, 3).reshape(nr, nc, -1)  # [nr, nc, n_sub]
    pmin = sub.min(axis=-1)
    pmax = sub.max(axis=-1)
    blo_c = jnp.minimum(jnp.clip(jnp.floor(pmin), 0, max_base), b_mean)
    bhi_c = jnp.maximum(jnp.clip(jnp.ceil(pmax), 0, max_base), b_mean)
    one = (b_mean - blo_c <= radius) & (bhi_c - b_mean <= radius)

    big = jnp.float32(1e30)
    uncov = jnp.full(sub.shape, True)
    bases = []
    nw = jnp.zeros(b_mean.shape, jnp.int32)
    for _ in range(max_windows):
        v = jnp.where(uncov, sub, big).min(axis=-1)  # lowest uncovered target
        any_u = v < big
        # center the window on the uncovered group reachable from v
        vhi = jnp.where(uncov & (sub <= v[..., None] + 2 * radius), sub, -big)
        vhi = jnp.maximum(vhi.max(axis=-1), v)
        c = jnp.clip(jnp.round((v + vhi) * 0.5), 0, max_base).astype(jnp.int32)
        bases.append(c)
        nw = nw + any_u.astype(jnp.int32)
        uncov = uncov & (sub > c[..., None].astype(jnp.float32) + radius)
    bases = jnp.stack(bases, axis=-1)  # [nr, nc, K]
    # smooth tiles: the round-2 single-base plan, bit-identical
    bases = jnp.where(one[..., None], b_mean[..., None], bases)
    nw = jnp.where(one, 1, jnp.maximum(nw, 1))
    return bases, nw


def refine_level(
    left_g,
    right_g,
    prior,
    cfg: MatchConfig,
    radius: int,
    max_base: int,
    tile_rows: int = 32,
    interpret: Optional[bool] = None,
    g_row0=0,
    g_h: Optional[int] = None,
    lr: bool = False,
    max_windows: int = 4,
):
    """One pyramid refinement level via the Pallas kernel. ``left_g/right_g``
    f32[H, W] gray; ``prior`` f32[H, W] disparity estimate; returns f32[H, W].
    ``g_row0``/``g_h``: global row window when the inputs are a halo-extended
    row shard of a larger image.

    ``max_windows``: cap on the adaptive per-tile base-window count (see
    :func:`tile_windows_from_prior`); 1 recovers the round-2 single-base
    kernel everywhere.

    ``lr=True`` additionally returns the right-view disparity ``dR`` (f32
    [H, W]; −1e6 where no candidate covered the column), accumulated inside
    the kernel from the same aggregated costs (costR(u, s) = costL(u+s, s))
    via a shifting-frame running min — ~1.2× the plain level's cost instead
    of a mirrored second pyramid. dR's candidate set at u is the union of the
    column tiles' ``base ± R`` windows covering u, so it carries the same
    tile-quantization contract as the forward disparity."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.cost not in ("sad", "ssd", "census"):
        raise NotImplementedError(f"pallas refine: cost {cfg.cost!r} unsupported")
    rbox = cfg.window // 2
    if radius >= 64:
        raise ValueError(f"refine radius {radius} ≥ 64 (right-block headroom)")
    # margin: box support each side of the output span + wrap-pollution guard
    M = _round_up(2 * rbox, 8)
    if M + _TW + 2 * rbox > _CW:
        raise ValueError(f"window {cfg.window} too wide for the {_CW} cost region")
    h, w = left_g.shape
    RV = _round_up(rbox, 8)
    tile_rows = _round_up(tile_rows, 8)
    PADB = _round_up(max_base + radius, 128)
    PADL = PADB + M  # ≡ M (mod 128) → left block slices stay 128-aligned
    PADR = _BW2 - _TW - M  # right-block tail headroom past the last col tile

    wp = _round_up(w, _TW)
    hp = _round_up(h, tile_rows)
    nc = wp // _TW
    Wp = PADL + wp + PADR

    # RV rows of padding top and bottom keep every kernel slab interior
    lg_p = jnp.pad(left_g, ((RV, RV + hp - h), (PADL, PADR + wp - w)), mode="edge")
    rg_p = jnp.pad(right_g, ((RV, RV + hp - h), (PADL, PADR + wp - w)), mode="edge")
    prior_p = jnp.pad(prior, ((0, hp - h), (0, wp - w)), mode="edge")
    bases, nw = tile_windows_from_prior(
        prior_p, tile_rows, max_base, radius, max_windows
    )

    nplanes = 0
    if cfg.cost == "census":
        # census descriptors in XLA on the edge-padded images (edge-pad then
        # census == census of the true image inside the real region, matching
        # pallas_dense.raw_match); [H, W, P] → [P, H, W] for contiguous slabs
        lg_p = jnp.moveaxis(dense.census_transform(lg_p, cfg.census_window), -1, 0)
        rg_p = jnp.moveaxis(dense.census_transform(rg_p, cfg.census_window), -1, 0)
        nplanes = int(lg_p.shape[0])

    kern = functools.partial(
        _refine_kernel,
        Hp=hp,
        Wp=Wp,
        Hr=h,
        Wr=w,
        TH=tile_rows,
        RV=RV,
        win=cfg.window,
        R=radius,
        M=M,
        PADL=PADL,
        PADB=PADB,
        nc=nc,
        K=int(bases.shape[-1]),
        g_h=g_h,
        nplanes=nplanes,
        squared=cfg.cost == "ssd",
        lr=lr,
    )
    tile_spec = pl.BlockSpec(
        (tile_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    g_row0_arr = jnp.asarray(g_row0, jnp.int32).reshape(1)
    out_shape = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(hp // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[tile_spec, tile_spec] if lr else tile_spec,
        out_shape=[out_shape, out_shape] if lr else out_shape,
        interpret=interpret,
    )(bases, nw, g_row0_arr, lg_p, rg_p)
    if lr:
        return out[0][:h, :w], out[1][:h, :w]
    return out[:h, :w]


def refine_level_shard(
    left_g,
    right_g,
    prior,
    cfg: MatchConfig,
    radius: int,
    max_base: int,
    tile_rows: int,
    interpret: Optional[bool],
    g_row0,
    g_h: int,
    max_windows: int = 4,
):
    """Shard-aware alias of :func:`refine_level` (traced ``g_row0``)."""
    return refine_level(
        left_g, right_g, prior, cfg, radius, max_base, tile_rows, interpret,
        g_row0=g_row0, g_h=g_h, max_windows=max_windows,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "pyr", "tile_rows", "interpret", "lr_check", "coarse_backend", "sgm"
    ),
)
def match_hierarchical_pallas(
    left,
    right,
    cfg: MatchConfig = MatchConfig(),
    pyr: PyramidConfig = PyramidConfig(),
    tile_rows: int = 64,
    interpret: Optional[bool] = None,
    lr_check: bool = False,
    coarse_backend: str = "wta",
    sgm: Optional[SGMConfig] = None,
) -> dense.MatchResult:
    """Coarse-to-fine matching, all levels on Pallas kernels: fused dense
    matcher at the coarsest level, tile-base refine kernel per finer level.
    Effective range ≈ coarsest_disparities × 2^(levels−1) at a per-level cost
    of (2R+1) candidates.

    ``tile_rows`` trades refine quality for speed: disparity bases are
    quantized per (tile_rows × 128) tile, and larger tiles amortize the
    vertical box-sum halo (measured 1080p level-0: 1.09/0.94/0.79 ms at
    32/64/128). The default 64 keeps base tiles well under typical prior
    smoothness; drop to 32 for scenes with steep disparity gradients.

    ``lr_check``: mark pixels failing the left-right consistency test invalid
    and fill them from their scanline neighbors. The right-view disparity
    comes from the final refine level's own aggregated costs (its in-kernel
    shifting-frame right WTA, see :func:`refine_level` ``lr=True``) — ~1.2×
    the plain runtime, replacing the round-1 mirrored second pyramid (2.2×).

    ``coarse_backend``: ``"wta"`` (default) runs the fused exhaustive matcher
    at the coarsest level; ``"sgm"`` runs the all-Pallas semi-global matcher
    (:func:`stepth_tpu.match.pallas_sgm.match_pair_sgm_pallas`, knobs via
    ``sgm``) there instead. The coarse level is 4^(levels−1)× smaller than the
    full image, so SGM's scanline regularization — which costs ~12× the
    flagship at full resolution (the materialized cost volume is HBM-bound) —
    is nearly free here, and its smoother prior survives into the refine
    levels: repetitive texture and low-contrast regions that alias under
    exhaustive WTA resolve to the coherent disparity surface."""
    from stepth_tpu.match import pyramid as pyr_mod

    lg = dense.grayscale(left)
    rg = dense.grayscale(right)
    lefts, rights = [lg], [rg]
    for _ in range(pyr.levels - 1):
        lefts.append(pyr_mod.downsample2(lefts[-1]))
        rights.append(pyr_mod.downsample2(rights[-1]))

    coarse_cfg = MatchConfig(
        num_disparities=pyr.coarsest_disparities,
        window=cfg.window,
        cost=cfg.cost,
        census_window=cfg.census_window,
        subpixel=cfg.subpixel,
        lr_threshold=None,
    )
    if coarse_backend == "wta":
        disp, _, _, _ = pallas_dense.raw_match(
            lefts[-1], rights[-1], coarse_cfg, tile_rows=min(tile_rows, 16),
            interpret=interpret,
        )
    elif coarse_backend == "sgm":
        from stepth_tpu.match import pallas_sgm

        res_c = pallas_sgm.match_pair_sgm_pallas(
            lefts[-1],
            rights[-1],
            coarse_cfg,
            SGMConfig() if sgm is None else sgm,
            tile_rows=min(tile_rows, 16),
            interpret=interpret,
        )
        disp = res_c.disparity
    else:
        raise ValueError(f"coarse_backend must be 'wta' or 'sgm', got {coarse_backend!r}")
    max_base = pyr.coarsest_disparities
    disp_r = None
    for lvl in range(pyr.levels - 2, -1, -1):
        h, w = lefts[lvl].shape
        prior = pyr_mod.upsample2_disparity(disp, h, w)
        max_base = max_base * 2
        want_lr = lr_check and lvl == 0  # dR only needed at full resolution
        r_lvl = pyr.final_radius if lvl == 0 else pyr.refine_radius
        nw_lvl = pyr.final_windows if lvl == 0 else pyr.refine_windows
        out = refine_level(
            lefts[lvl], rights[lvl], prior, cfg, r_lvl, max_base,
            tile_rows, interpret, lr=want_lr, max_windows=nw_lvl,
        )
        disp = out[0] if want_lr else out
        if want_lr:
            disp_r = out[1]

    from stepth_tpu.match import pallas_post

    if lr_check:
        if pyr.levels == 1:
            raise ValueError("lr_check needs at least one refine level")
        d_eff = pyr.coarsest_disparities << (pyr.levels - 1)
        thr = 1.0 if cfg.lr_threshold is None else float(cfg.lr_threshold)
        valid = pallas_post.lr_consistency_pallas(
            disp, disp_r, thr, d_eff, interpret=interpret
        )
        disp = pallas_post.fill_invalid_pallas(disp, valid, interpret=interpret)
        disp = pallas_post.median3_pallas(disp, interpret=interpret)
        return dense.MatchResult(
            disparity=disp, valid=valid, cost=jnp.zeros_like(disp)
        )

    disp = pallas_post.median3_pallas(disp, interpret=interpret)
    return dense.MatchResult(
        disparity=disp, valid=disp >= 0, cost=jnp.zeros_like(disp)
    )


def match_temporal_pallas(
    lefts,
    rights,
    cfg: MatchConfig = MatchConfig(),
    pyr: PyramidConfig = PyramidConfig(),
    keyframe_interval: int = 8,
    tile_rows: int = 64,
    interpret: Optional[bool] = None,
    lr_check: bool = False,
    coarse_backend: str = "wta",
    sgm: Optional[SGMConfig] = None,
) -> dense.MatchResult:
    """Video stereo with temporal seeding, one jit for the whole clip.

    ``lefts``/``rights``: stacked frames ``[T, H, W]`` (or ``[T, H, W, 3]``).
    Frame 0 and every ``keyframe_interval``-th frame run the full
    coarse-to-fine pyramid; every other frame skips the coarse levels and
    runs ONLY the full-resolution refine kernel seeded by the previous
    frame's disparity — video disparity rarely moves more than the refine
    radius (±R px) between frames, and the multi-window plan absorbs larger
    jumps near object boundaries exactly as it absorbs spatial
    discontinuities. Measured 1080p (nw=6 default): a seeded step costs
    ~1.17 ms vs the 1.64 ms full pyramid — see BASELINE.md round 4.

    Disoccluded or fast-moving regions whose true disparity leaves the
    seeded search window self-correct at the next keyframe;
    ``keyframe_interval=1`` degenerates to per-frame full pyramids. The
    whole clip is a ``lax.scan`` carrying (previous disparity, frame index),
    with ``lax.cond`` selecting keyframe vs seeded step — one dispatch per
    clip, stacked :class:`MatchResult` out.
    """
    from stepth_tpu.match import pallas_post

    if lefts.ndim not in (3, 4):
        raise ValueError(f"expected [T,H,W] or [T,H,W,C], got {lefts.shape}")
    if keyframe_interval < 1:
        raise ValueError(f"keyframe_interval must be >= 1, got {keyframe_interval}")
    max_base = pyr.coarsest_disparities << (pyr.levels - 1)

    def _post(disp, disp_r):
        if lr_check:
            thr = 1.0 if cfg.lr_threshold is None else float(cfg.lr_threshold)
            valid = pallas_post.lr_consistency_pallas(
                disp, disp_r, thr, max_base, interpret=interpret
            )
            disp = pallas_post.fill_invalid_pallas(disp, valid, interpret=interpret)
            disp = pallas_post.median3_pallas(disp, interpret=interpret)
            return dense.MatchResult(
                disparity=disp, valid=valid, cost=jnp.zeros_like(disp)
            )
        disp = pallas_post.median3_pallas(disp, interpret=interpret)
        return dense.MatchResult(
            disparity=disp, valid=disp >= 0, cost=jnp.zeros_like(disp)
        )

    def full(l, r, _prior):
        return match_hierarchical_pallas(
            l, r, cfg, pyr, tile_rows, interpret, lr_check,
            coarse_backend, sgm,
        )

    def seeded(l, r, prior):
        lg = dense.grayscale(l)
        rg = dense.grayscale(r)
        out = refine_level(
            lg, rg, prior, cfg, pyr.final_radius, max_base,
            tile_rows, interpret, lr=lr_check, max_windows=pyr.final_windows,
        )
        if lr_check:
            return _post(out[0], out[1])
        return _post(out, None)

    def step(carry, lr_pair):
        prev, i = carry
        res = jax.lax.cond(
            i % keyframe_interval == 0,
            lambda: full(*lr_pair, prev),
            lambda: seeded(*lr_pair, prev),
        )
        return (res.disparity, i + 1), res

    h, w = lefts.shape[1:3]
    init = (jnp.zeros((h, w), jnp.float32), jnp.int32(0))
    _, out = jax.lax.scan(step, init, (lefts, rights))
    return out
