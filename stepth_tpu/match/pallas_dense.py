"""Fused Pallas TPU kernel for dense stereo matching.

One kernel fuses the whole per-pixel hot path of
:func:`stepth_tpu.match.dense.match_pair` — cost computation over all D
disparities, box-window aggregation, winner-take-all with subpixel neighbors,
and the right-view WTA for the LR check — without ever materializing the
[H, W, D] cost volume in HBM (the XLA path writes it at least twice: ~1 GB at
1080p/D=128). The grid walks row tiles; each instance DMAs a (TH + 2·RV)-row
slab of both images into VMEM and loops over disparities with everything
VMEM-resident:

* disparity shift          = ``pltpu.roll`` along lanes + edge-replicate mask
  (identical to the XLA path's edge-padded shift);
* box aggregation          = unmasked rolls over cost that was zero-masked
  once at the source (out-of-image rows/cols), exactly the zero-pad clipping
  of :func:`dense.box_aggregate`; input padding keeps every roll wrap-free,
  and window 9 uses an exact two-stage 3×3 decomposition (6 rolls per axis);
* WTA + subpixel neighbors = running (best, argbest, c[d−1], c[d], c[d+1])
  carried through the disparity ``fori_loop``;
* right-view disparity     = the same aggregated slice rolled by −d
  (costR(x, d) = costL(x+d, d)), one extra running min.

No per-pixel gathers anywhere: dynamic gathers route through the TPU scalar
core (measured ~500 ms for a single 1080p gather — the reason the XLA
hierarchical path was 689 ms/frame).

Scalar epilogue (LR validity, occlusion fill, median) stays in XLA where it is
cheap and fusible.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stepth_tpu.config import MatchConfig
from stepth_tpu.match import dense

_BIG = 1e30  # python float: jnp scalars would be captured consts in the kernel


def box_sum_slab(cost, zero_mask, *, win, S, W, RV, TH):
    """Box-window sum over a [S, W] VMEM cost slab: vertical box on the full
    slab, extract the TH output rows, horizontal box on [TH, W] only (the
    horizontal pass needs no vertical context, so running it after extraction
    saves the 2·RV halo rows' worth of lane rolls). The cost is zeroed ONCE at
    the source (``zero_mask`` marks in-image rows/cols — the zero-pad clipping
    of :func:`dense.box_aggregate`), so the rolls below need no per-offset
    masks; the caller's padding guarantees every roll is wrap-free for the
    extracted rows. Window 9 uses an exact two-stage 3×3 decomposition
    (4 rolls per axis instead of 8)."""
    cost = cost * zero_mask
    rbox = win // 2
    if win == 9:
        y = cost
        for sh in (1, S - 1):
            y = y + pltpu.roll(cost, sh, axis=0)
        z = y
        for sh in (3, S - 3):
            z = z + pltpu.roll(y, sh, axis=0)
        v = z[RV : RV + TH]
        y = v
        for sh in (1, W - 1):
            y = y + pltpu.roll(v, sh, axis=1)
        z = y
        for sh in (3, W - 3):
            z = z + pltpu.roll(y, sh, axis=1)
        return z
    aggv = jnp.zeros_like(cost)
    for j in range(-rbox, rbox + 1):
        aggv = aggv + pltpu.roll(cost, (-j) % S, axis=0)
    aggv = aggv[RV : RV + TH]
    agg = jnp.zeros_like(aggv)
    for mshift in range(-rbox, rbox + 1):
        agg = agg + pltpu.roll(aggv, (-mshift) % W, axis=1)
    return agg


def _kernel(
    g_row0_ref,
    l_hbm,
    r_hbm,
    disp_ref,
    dispr_ref,
    cbest_ref,
    valid_ref,
    *,
    H,
    W,
    Hr,
    Wr,
    D,
    TH,
    RV,
    win,
    lr_threshold,
    g_h=None,
    nplanes=0,
    squared=False,
    uniqueness=None,
):
    """``H``/``W`` are the padded slab dims; ``Hr``/``Wr`` the real image dims —
    window-clipping masks use the real dims so borders match the XLA path.
    ``lr_threshold``: python float, or None to skip the in-kernel LR sweep.
    ``g_row0_ref``/``g_h``: when the input is a row-shard of a larger image
    (halo included), the shard's global starting row (SMEM scalar, traced under
    shard_map) and the global image height, so cost clipping happens at the
    *true* image borders (seam exactness)."""
    if g_h is None:
        g_h = Hr
    g_row0 = g_row0_ref[0]
    S = TH + 2 * RV
    i = pl.program_id(0)
    # The caller pads the input with RV rows top and bottom, so every slab is
    # interior: start = i*TH in padded coords (multiple of 8 — aligned DMA),
    # the output tile always begins at slab row RV, and all box-sum roll
    # offsets (≤ RV) stay wrap-free for the extracted rows.
    start = pl.multiple_of(i * TH, 8)

    def body(l_slab, r_slab, sem_l, sem_r):
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

        if nplanes:
            # census mode: slabs are u32 descriptor planes [P, S, W]
            lp = [l_slab[p] for p in range(nplanes)]
            rp = [r_slab[p] for p in range(nplanes)]
            redges = [x[:, :1] for x in rp]
        else:
            l = l_slab[:]
            r = r_slab[:]
            redge = r[:, :1]  # edge column for out-of-range shifts

        rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)  # slab row ids
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        # Cost is zeroed ONCE at the source (out-of-image rows/cols contribute
        # nothing — the zero-pad clipping of dense.box_aggregate), so the box
        # sums below need no per-offset masks. The caller's padding guarantees
        # every roll the extracted rows/cols depend on is wrap-free: vertical
        # margin RV ≥ rbox+1 rows each side, horizontal margin win//2 cols of
        # zeroed cost before any wrap reaches a real column.
        lrow = start + rows - RV  # local (unpadded-input) row of slab row k
        vz = (lrow >= 0) & (lrow < Hr)
        gr = g_row0 + lrow
        vz &= (gr >= 0) & (gr < g_h)
        zero_mask = vz.astype(jnp.float32) * (cols < Wr).astype(jnp.float32)

        def box_sum(cost):
            return box_sum_slab(
                cost, zero_mask, win=win, S=S, W=W, RV=RV, TH=TH
            )

        def dloop(d, carry):
            (best, bestd, cm1, cb, cp1, prev, bestr, bestrd, runlag2, second,
             r_rot) = carry

            # r_rot carries roll(r, d) incrementally: one static roll-by-1 per
            # step instead of a dynamic (log-decomposed) roll-by-d
            if nplanes:
                ham = jnp.zeros((S, W), jnp.int32)
                for p in range(nplanes):
                    rsp = jnp.where(cols < d, redges[p], r_rot[p])
                    # popcount on the u32 xor (≤32, safe to widen to i32 after)
                    ham = ham + jax.lax.population_count(lp[p] ^ rsp).astype(
                        jnp.int32
                    )
                cost = ham.astype(jnp.float32)
                r_rot = [pltpu.roll(x, 1, axis=1) for x in r_rot]
            else:
                rs = jnp.where(cols < d, redge, r_rot)  # edge-replicate (x−d < 0)
                diff = l - rs
                cost = diff * diff if squared else jnp.abs(diff)  # [S, W]
                r_rot = pltpu.roll(r_rot, 1, axis=1)

            aggc = box_sum(cost)  # [TH, W] output rows (tiles are interior)

            # left WTA with subpixel neighbor tracking
            upd = aggc < best
            is_next = jnp.logical_and(jnp.logical_not(upd), bestd == d - 1)
            cm1 = jnp.where(upd, prev, cm1)
            cb = jnp.where(upd, aggc, cb)
            cp1 = jnp.where(is_next, aggc, cp1)

            # second-best outside the ±1 exclusion zone (dense.wta uniqueness):
            # on a new best at d, restart from min over [0, d-2] (= runlag2);
            # otherwise accumulate costs with d > bestd + 1. Costs between an
            # old best and a newer one re-enter through runlag2 at that update.
            if uniqueness is not None:
                far = jnp.logical_and(jnp.logical_not(upd), d > bestd + 1)
                second = jnp.where(upd, runlag2, second)
                second = jnp.where(far, jnp.minimum(second, aggc), second)
                # now min over [0, d-1]; at d=0 `prev` is the init zero — gate
                # it out arithmetically (a scalar-conditioned select over the
                # vector trips a Mosaic replicated-layout relayout bug)
                gate_big = (d < 1).astype(jnp.float32) * _BIG
                runlag2 = jnp.minimum(runlag2, prev + gate_big)

            best = jnp.where(upd, aggc, best)
            bestd = jnp.where(upd, d, bestd)

            # right WTA: costR(x) = costL(x+d)
            aggr = pltpu.roll(aggc, (W - d) % W, axis=1)
            aggr = jnp.where(cols > Wr - 1 - d, _BIG, aggr)
            updr = aggr < bestr
            bestr = jnp.where(updr, aggr, bestr)
            bestrd = jnp.where(updr, d, bestrd)

            return (best, bestd, cm1, cb, cp1, aggc, bestr, bestrd, runlag2,
                    second, r_rot)

        zero = jnp.zeros((TH, W), jnp.float32)
        izero = jnp.zeros((TH, W), jnp.int32)
        # layout anchor: a computed (non-splat) zero vector. Splat-initialized
        # carries that survive the loop (runlag2/second) trip a Mosaic
        # relayout bug ("non-singleton dimension replicated in destination"):
        # the carry's layout is inferred replicated from the init while the
        # body yields a concrete layout. Mixing in iota-derived zeros pins the
        # init to a concrete layout.
        anchor = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1),
            0,
        ).astype(jnp.float32)
        init = (
            zero + _BIG,  # best
            izero,  # bestd
            zero,  # c[d-1]
            zero + _BIG,  # c[best]
            zero + _BIG,  # c[d+1]
            zero,  # prev agg
            zero + _BIG,  # bestR
            izero,  # bestRd
            zero + _BIG + anchor,  # runlag2: min cost over [0, d-2]
            zero + _BIG + anchor,  # second best outside the ±1 exclusion zone
            list(rp) if nplanes else r,  # r_rot = roll(r, d), advanced in-loop
        )
        (best, bestd, cm1, cb, cp1, _, bestr, bestrd, _, second, _) = (
            jax.lax.fori_loop(0, D, dloop, init)
        )

        # parabolic subpixel (matches dense.wta)
        denom = cm1 - 2.0 * cb + cp1
        delta = jnp.where(jnp.abs(denom) > 1e-6, (cm1 - cp1) / (2.0 * denom), 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        interior = (bestd >= 1) & (bestd <= D - 2)
        disp = jnp.where(
            interior, bestd.astype(jnp.float32) + delta, bestd.astype(jnp.float32)
        )

        disp_ref[:] = disp
        dispr = bestrd.astype(jnp.float32)
        dispr_ref[:] = dispr
        cbest_ref[:] = cb

        # uniqueness-ratio validity (dense.wta): best*(1+u) must beat the
        # second-best cost outside the ±1 exclusion zone
        uok = (
            jnp.ones((TH, W), jnp.float32)
            if uniqueness is None
            else (cb * (1.0 + uniqueness) <= second).astype(jnp.float32)
        )
        if lr_threshold is None:
            valid_ref[:] = uok
        else:
            # LR consistency, gather-free (same formulation as
            # dense.lr_consistency): sweep candidate integer shifts d and
            # select where round(x − dL) == clip(x − d); dR at column x − d is
            # a lanes-roll with edge-clamping.
            colf = cols.astype(jnp.float32)  # [1, W]
            wmax = jnp.float32(Wr - 1)
            xr = jnp.clip(jnp.round(colf - disp), 0.0, wmax)
            dredge = dispr[:, :1]

            def lr_body(d, ok):
                dr_s = pltpu.roll(dispr, d, axis=1)
                dr_s = jnp.where(cols < d, dredge, dr_s)
                sel = xr == jnp.clip(colf - d.astype(jnp.float32), 0.0, wmax)
                hit = sel & (jnp.abs(disp - dr_s) <= lr_threshold)
                # f32 carry: Mosaic's scf.for cannot legalize a bool vector carry
                return jnp.maximum(ok, hit.astype(jnp.float32))

            ok = jax.lax.fori_loop(0, D, lr_body, jnp.zeros((TH, W), jnp.float32))
            valid_ref[:] = ok * uok

    slab_ty = (
        pltpu.VMEM((nplanes, S, W), jnp.uint32)
        if nplanes
        else pltpu.VMEM((S, W), jnp.float32)
    )
    pl.run_scoped(
        body,
        l_slab=slab_ty,
        r_slab=slab_ty,
        sem_l=pltpu.SemaphoreType.DMA,
        sem_r=pltpu.SemaphoreType.DMA,
    )


def _round_up(x, m):
    return (x + m - 1) // m * m


def raw_match(
    lg,
    rg,
    cfg: MatchConfig,
    tile_rows: int = 32,
    interpret: Optional[bool] = None,
    g_row0: int = 0,
    g_h: Optional[int] = None,
):
    """Run the fused kernel on gray f32 images; returns
    ``(disp, disp_r, cbest, valid)`` full-size, pre-epilogue. ``g_row0``/``g_h``
    mark the global row window when ``lg`` is a halo-extended row shard."""
    if cfg.cost not in ("sad", "ssd", "census"):
        raise NotImplementedError(f"pallas matcher: cost {cfg.cost!r} unsupported")
    if interpret is None:
        # fall back to the interpreter on non-TPU backends (CPU test meshes)
        interpret = jax.default_backend() != "tpu"
    h, w = lg.shape
    D = cfg.num_disparities
    # halo rounded up to the f32 sublane tile (8) so DMA row starts stay aligned
    RV = _round_up(cfg.window // 2, 8)
    tile_rows = _round_up(tile_rows, 8)

    # pad to tile/lane-friendly shapes (edge-replicate, sliced off afterwards)
    # horizontal margin win//2 of (zero-masked) columns keeps box-sum rolls
    # wrap-free; vertical: RV rows of padding each side make every slab interior
    wp = _round_up(w + cfg.window // 2, 128)
    hp = _round_up(h, tile_rows)
    lg_p = jnp.pad(lg, ((RV, RV + hp - h), (0, wp - w)), mode="edge")
    rg_p = jnp.pad(rg, ((RV, RV + hp - h), (0, wp - w)), mode="edge")

    nplanes = 0
    if cfg.cost == "census":
        # census descriptors computed in XLA on the padded image (edge-pad then
        # census == census of the true image inside the real region, since the
        # XLA census also edge-pads); the kernel matches u32 planes by hamming
        # distance. [H, W, P] → [P, H, W] so planes DMA as contiguous slabs.
        lg_p = jnp.moveaxis(dense.census_transform(lg_p, cfg.census_window), -1, 0)
        rg_p = jnp.moveaxis(dense.census_transform(rg_p, cfg.census_window), -1, 0)
        nplanes = int(lg_p.shape[0])

    kern = functools.partial(
        _kernel,
        H=hp,
        W=wp,
        Hr=h,
        Wr=w,
        D=D,
        TH=tile_rows,
        RV=RV,
        win=cfg.window,
        lr_threshold=None if cfg.lr_threshold is None else float(cfg.lr_threshold),
        g_h=g_h,
        nplanes=nplanes,
        squared=cfg.cost == "ssd",
        uniqueness=None if cfg.uniqueness is None else float(cfg.uniqueness),
    )
    out_shape = [
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),  # disparity
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),  # right disparity
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),  # best cost
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),  # LR validity
    ]
    grid = (hp // tile_rows,)
    tile_spec = pl.BlockSpec(
        (tile_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    g_row0_arr = jnp.asarray(g_row0, jnp.int32).reshape(1)
    disp, disp_r, cbest, valid_f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[tile_spec, tile_spec, tile_spec, tile_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(g_row0_arr, lg_p, rg_p)
    return disp[:h, :w], disp_r[:h, :w], cbest[:h, :w], valid_f[:h, :w]


@functools.partial(jax.jit, static_argnames=("cfg", "tile_rows", "interpret"))
def match_pair_pallas(
    left,
    right,
    cfg: MatchConfig = MatchConfig(),
    tile_rows: int = 32,
    interpret: Optional[bool] = None,
):
    """Fused-kernel twin of :func:`stepth_tpu.match.dense.match_pair`
    (sad/ssd/census). Same output contract; the cheap epilogue (occlusion fill,
    median) runs in XLA."""
    from stepth_tpu.match import pallas_post

    lg = dense.grayscale(left)
    rg = dense.grayscale(right)
    disp, _, cbest, valid_f = raw_match(lg, rg, cfg, tile_rows, interpret)
    valid = valid_f > 0.5
    disp = pallas_post.fill_invalid_pallas(disp, valid, interpret=interpret)
    disp = pallas_post.median3_pallas(disp, interpret=interpret)
    return dense.MatchResult(disparity=disp, valid=valid, cost=cbest)
