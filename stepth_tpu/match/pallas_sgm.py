"""Pallas TPU pipeline for semi-global matching.

The XLA SGM backend (:mod:`stepth_tpu.match.sgm`) is correct but leaves a lot
on the table: the cost-volume front and the WTA/LR epilogue pay the same
materialization taxes the dense XLA path pays (the reason
:mod:`stepth_tpu.match.pallas_dense` exists), and the directional scans fight
XLA's layout assignment between producers and consumers. This module runs the
whole SGM pipeline as four small Pallas kernels chained through HBM:

1. **Volume kernel** — the cost front of :func:`pallas_dense._kernel`
   (slab DMA, incremental disparity roll, zero-masked box sums) emitting the
   box-aggregated cost volume as ``f32[D, H, W]`` (disparity outermost:
   directional scans want [T, D-on-sublanes? no —] each scan step consumes a
   ``[D, T]`` slab with the orthogonal axis T on lanes and D on sublanes, so
   planes of constant ``d`` stay contiguous for clean DMA).
2. **Scan kernel** (×2/4/8 directions) — the SGM recurrence along rows or
   columns. Sequential grid along the scan axis; the ``[D, T]`` carry lives in
   VMEM scratch across grid steps; each grid step unrolls ``BS`` recurrence
   steps on a pipelined ``[D, BS, T]`` block. Disparity-neighbor shifts are
   sublane rolls, the min over D a sublane reduction — a handful of wide VPU
   ops per pixel-step. Direction sums accumulate through an aliased
   accumulator input (``out = acc + L_r``), in the same order as the XLA
   backend so results match bit-for-bit. Column scans run on the
   ``[D, W, H]``-transposed volume (one XLA transpose each way); diagonal
   scans shift the carry one lane per step (zero-filled, so border pixels
   start fresh exactly like the XLA pad).
3. **WTA kernel** — :func:`pallas_dense._kernel`'s disparity loop with the
   cost computation replaced by volume reads: running WTA with subpixel
   neighbors, second-best tracking for uniqueness, right-view WTA via lane
   rolls, and the gather-free LR sweep. Grid is (row tiles × disparity
   blocks); the per-pixel running state lives in VMEM scratch, outputs are
   written at the last disparity block.

Out-of-image handling: the padded volume carries zero cost outside the real
extent, and the scan kernels force ``L = 0`` there — so the first real pixel a
(possibly reversed) scan touches sees an all-zero predecessor, which is
exactly the XLA backend's fresh-start border (``min(0, P1, P2) − 0 = 0`` ⇒
``L = C``).

The epilogue (occlusion fill, median) reuses :mod:`stepth_tpu.match.pallas_post`.
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
from stepth_tpu.match.pallas_dense import _BIG, _round_up, box_sum_slab
from stepth_tpu.match.sgm import SGMConfig


def _default_interpret(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


# ---------------------------------------------------------------------------
# Kernel A: box-aggregated cost volume, f32[D, H, W]
# ---------------------------------------------------------------------------


def _volume_kernel(
    g_row0_ref,
    l_hbm,
    r_hbm,
    out_ref,
    l_slab,
    r_slab,
    rot,
    sem_l,
    sem_r,
    *,
    W,
    Hr,
    Wr,
    DB,
    TH,
    RV,
    win,
    nplanes,
    squared,
    g_h=None,
):
    i = pl.program_id(0)  # row tile
    j = pl.program_id(1)  # disparity block
    S = TH + 2 * RV
    start = pl.multiple_of(i * TH, 8)

    @pl.when(j == 0)
    def _load():
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
        rot[:] = r_slab[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lrow = start + rows - RV
    vz = (lrow >= 0) & (lrow < Hr)
    if g_h is not None:
        # row shard of a larger image: also zero rows outside the GLOBAL
        # image window, so halo/replicated rows at true borders contribute
        # nothing to the box sums — identical to the unsharded Hr mask
        g = g_row0_ref[0] + lrow
        vz &= (g >= 0) & (g < g_h)
    zero_mask = vz.astype(jnp.float32) * (cols < Wr).astype(jnp.float32)

    for k in range(DB):
        d = j * DB + k
        if nplanes:
            ham = jnp.zeros((S, W), jnp.int32)
            for p in range(nplanes):
                rsp = jnp.where(cols < d, r_slab[p][:, :1], rot[p])
                ham = ham + jax.lax.population_count(l_slab[p] ^ rsp).astype(
                    jnp.int32
                )
            cost = ham.astype(jnp.float32)
            for p in range(nplanes):
                rot[p] = pltpu.roll(rot[p], 1, axis=1)
        else:
            rs = jnp.where(cols < d, r_slab[:, :1], rot[:])
            diff = l_slab[:] - rs
            cost = diff * diff if squared else jnp.abs(diff)
            rot[:] = pltpu.roll(rot[:], 1, axis=1)
        out_ref[k] = box_sum_slab(
            cost, zero_mask, win=win, S=S, W=W, RV=RV, TH=TH
        ).astype(out_ref.dtype)


def _aggregated_volume(
    lg, rg, cfg: MatchConfig, tile_rows: int, interpret: bool,
    dtype=jnp.float32, g_row0=0, g_h=None,
):
    """Padded box-aggregated volume ``[D, hp, wp]`` (``dtype``) plus the padded
    dims. Same padding contract as :func:`pallas_dense.raw_match`, except ``hp``
    is rounded to 128 so both volume axes can sit on TPU lanes in the scans.

    ``g_row0``/``g_h``: global row window when ``lg``/``rg`` are a
    halo-extended row shard of a larger image (``g_row0`` may be traced);
    out-of-window rows contribute zero to the box sums, exactly like the
    unsharded builder's own border mask."""
    h, w = lg.shape
    D = cfg.num_disparities
    RV = _round_up(cfg.window // 2, 8)
    TH = _round_up(tile_rows, 8)
    wp = _round_up(w + cfg.window // 2, 128)
    hp = _round_up(h, max(TH, 128))

    lg_p = jnp.pad(lg, ((RV, RV + hp - h), (0, wp - w)), mode="edge")
    rg_p = jnp.pad(rg, ((RV, RV + hp - h), (0, wp - w)), mode="edge")

    nplanes = 0
    if cfg.cost == "census":
        lg_p = jnp.moveaxis(dense.census_transform(lg_p, cfg.census_window), -1, 0)
        rg_p = jnp.moveaxis(dense.census_transform(rg_p, cfg.census_window), -1, 0)
        nplanes = int(lg_p.shape[0])

    DB = D
    for cand in (16, 8, 4, 2, 1):
        if D % cand == 0 and cand <= D:
            DB = cand
            break
    S = TH + 2 * RV
    slab_ty = (
        pltpu.VMEM((nplanes, S, wp), jnp.uint32)
        if nplanes
        else pltpu.VMEM((S, wp), jnp.float32)
    )
    kern = functools.partial(
        _volume_kernel,
        W=wp,
        Hr=h,
        Wr=w,
        DB=DB,
        TH=TH,
        RV=RV,
        win=cfg.window,
        nplanes=nplanes,
        squared=cfg.cost == "ssd",
        g_h=g_h,
    )
    g_row0_arr = jnp.asarray(g_row0, jnp.int32).reshape(1)
    vol = pl.pallas_call(
        kern,
        grid=(hp // TH, D // DB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((DB, TH, wp), lambda i, j: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, hp, wp), dtype),
        scratch_shapes=[
            slab_ty,
            slab_ty,
            slab_ty,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g_row0_arr, lg_p, rg_p)
    return vol, (h, w, hp, wp)


# ---------------------------------------------------------------------------
# Kernel B: one SGM direction along axis 1 of f32[D, S, T], accumulating
# ---------------------------------------------------------------------------


def _plan_scan_tiling(D, S, T, *, shift, step_block, lane_tile):
    """Shared BS/TT selection + scoped-VMEM clamp for the directional scan
    kernels (:func:`_scan_direction` and :func:`scan_direction_carry` — one
    copy so a tuning change cannot desynchronize the sharded exact mode's
    bit-identical contract). See the call sites for the measured rationale."""
    BS = step_block if S % step_block == 0 else 8
    if shift == 0:
        cap = 512 if lane_tile is None else lane_tile
        if cap < 128:
            raise ValueError(
                f"lane_tile cap must be >= 128 (one lane register), got {cap}"
            )
        TT = 128
        for cand in range(cap // 128 * 128, 127, -128):
            if T % cand == 0:
                TT = cand
                break
    else:
        # the diagonal carry shift crosses tile boundaries, so T cannot tile;
        # the caller picks the volume orientation with the smaller T
        TT = T
    # Scoped-VMEM clamp: the [D, BS, TT] in/acc/out blocks are double-buffered
    # (~6 live copies); at TT = T (diagonals) the round-3 step_block=16
    # default exceeds the 16 MB scoped limit (observed 27.3 MB at D=64,
    # TT=1152 -> compile-time OOM, which silently broke 8-direction 1080p).
    # Halve BS until the estimate fits — the sweep's 4-direction optimum is
    # untouched because lane-tiled scans cap TT at lane_tile.
    while BS > 1 and 6 * D * BS * TT * 4 > 14 * 1024 * 1024:
        BS //= 2
    while S % BS:
        BS //= 2
    return BS, TT


def _scan_kernel(*refs, BS, D, TT, S_real, T_real, p1, p2, reverse, shift, first):
    # Layout note (measured, v5e): an alternative [S, D, T] volume layout
    # (scan axis as the outer block dim, so each step's slab is a
    # layout-native [D, TT] read) times IDENTICALLY to this [D, BS-sublane,
    # TT] blocking in isolation (3.70 vs 3.62 ms per 1080p direction) but
    # costs two extra materialized major transposes in the 4-direction
    # pipeline (~1.8 ms each) — full pipeline 21.0 vs 17.8 ms. The kernel is
    # VPU-issue-bound on its ~16 semantic ops per recurrence step, not on
    # block slicing.
    if first:
        v_ref, out_ref, carry = refs
        acc_ref = None
    else:
        v_ref, acc_ref, out_ref, carry = refs
    t = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)

    # NOTE on 16-bit compute: i16 arithmetic (exact for integer costs, half
    # the VPU issue count) and bf16 both dead-end in Mosaic — "Rotate with
    # non-32-bit data" is not implemented, and the recurrence needs sublane
    # rotates of the carry every step. This is also why the round-2 bf16
    # volume mode made the scans *slower*: the rolls forced f32 round-trips.
    zero = 0.0

    @pl.when(j == 0)
    def _init():
        carry[:] = jnp.zeros((D, TT), jnp.float32)

    tcol = jax.lax.broadcasted_iota(jnp.int32, (1, TT), 1) + t * TT
    tmask = tcol < T_real  # [1, TT] bool
    drow = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    up_edge = drow == 0  # hoisted: loop-invariant disparity-border masks
    dn_edge = drow == D - 1

    blk = (ns - 1 - j) if reverse else j
    # (measured dead ends, v5e: carrying ``prev`` in registers across the
    # unrolled steps instead of through the scratch, and replacing the jnp.min
    # sublane reduction with an explicit halving tree, were each ~0.5 ms
    # SLOWER over the 4-direction pipeline — register pressure beats the
    # saved VMEM round-trips at these block sizes)
    for k in range(BS):
        idx = BS - 1 - k if reverse else k
        s = blk * BS + idx  # global scan position of this step
        prev = carry[:]
        if shift > 0:
            prev = pltpu.roll(prev, shift, axis=1)
            prev = jnp.where(tcol - t * TT < shift, zero, prev)
        elif shift < 0:
            prev = pltpu.roll(prev, TT + shift, axis=1)
            prev = jnp.where(tcol - t * TT >= TT + shift, zero, prev)
        min_l = jnp.min(prev, axis=0, keepdims=True)  # [1, TT]
        up = jnp.where(up_edge, _BIG, pltpu.roll(prev, 1, axis=0))  # prev[d−1]
        dn = jnp.where(dn_edge, _BIG, pltpu.roll(prev, D - 1, axis=0))  # prev[d+1]
        # one add on min(up, dn) instead of two (same result: min distributes)
        cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
        cand = jnp.minimum(cand, min_l + p2)
        c = v_ref[:, idx, :].astype(jnp.float32)
        L = (c + cand) - min_l
        # Zero outside the real extent so a scan entering the real region from
        # padding sees an all-zero predecessor (= the XLA backend's fresh
        # start). Only *reverse* scans enter from padding (forward scans start
        # at s=0 with a zero carry), and for axis-aligned scans the T lanes
        # are independent (padded lanes never leak into real ones), so the
        # mask is only materialized where it can matter.
        if shift != 0:
            smask = tmask & (s < S_real)
            L = jnp.where(smask, L, zero)
        elif reverse:
            L = jnp.where(s < S_real, L, zero)
        if first:
            out_ref[:, idx, :] = L.astype(out_ref.dtype)
        else:
            out_ref[:, idx, :] = (
                acc_ref[:, idx, :].astype(jnp.float32) + L
            ).astype(out_ref.dtype)
        carry[:] = L


def _scan_direction(
    vol,
    acc,
    *,
    S_real: int,
    T_real: int,
    p1: float,
    p2: float,
    reverse: bool,
    shift: int = 0,
    interpret: bool = False,
    step_block: int = 8,
    lane_tile: Optional[int] = None,
):
    """Run one direction over ``vol`` [D, S, T]; returns ``acc + L_dir``
    (or ``L_dir`` when ``acc`` is None). ``shift`` ≠ 0 (diagonals) disables
    T-tiling — the carry shift crosses tile boundaries. ``step_block`` is the
    number of recurrence steps unrolled per grid step (must divide S);
    ``lane_tile`` caps the T-tile width: the largest 128-multiple divisor of
    ``T`` ≤ the cap is used (so one knob serves both scan orientations)."""
    D, S, T = vol.shape
    BS, TT = _plan_scan_tiling(
        D, S, T, shift=shift, step_block=step_block, lane_tile=lane_tile
    )
    first = acc is None
    kern = functools.partial(
        _scan_kernel,
        BS=BS,
        D=D,
        TT=TT,
        S_real=S_real,
        T_real=T_real,
        p1=float(p1),
        p2=float(p2),
        reverse=reverse,
        shift=shift,
        first=first,
    )
    if reverse:
        imap = lambda t, j, ns=S // BS: (0, ns - 1 - j, t)  # noqa: E731
    else:
        imap = lambda t, j: (0, j, t)  # noqa: E731
    spec = pl.BlockSpec((D, BS, TT), imap)
    in_specs = [spec] if first else [spec, spec]
    operands = (vol,) if first else (vol, acc)
    return pl.pallas_call(
        kern,
        grid=(T // TT, S // BS),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((D, S, T), vol.dtype),
        scratch_shapes=[pltpu.VMEM((D, TT), jnp.float32)],
        input_output_aliases={} if first else {1: 0},
        interpret=interpret,
    )(*operands)


def _scan_kernel_carry(
    *refs, BS, D, TT, S_real, T_real, p1, p2, reverse, shift, first
):
    """:func:`_scan_kernel` with carry I/O for the sharded relay: the scan
    seeds from ``cin_ref`` (the upstream shard's final carry) instead of
    zeros, and emits its own final carry to ``cout_ref`` — everything else is
    the identical recurrence, so a seeded local scan reproduces the
    continuous unsharded scan bit-for-bit on its rows."""
    if first:
        v_ref, cin_ref, out_ref, cout_ref, carry = refs
        acc_ref = None
    else:
        v_ref, acc_ref, cin_ref, out_ref, cout_ref, carry = refs
    t = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)
    zero = 0.0

    @pl.when(j == 0)
    def _init():
        carry[:] = cin_ref[...]

    tcol = jax.lax.broadcasted_iota(jnp.int32, (1, TT), 1) + t * TT
    tmask = tcol < T_real
    drow = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    up_edge = drow == 0
    dn_edge = drow == D - 1

    blk = (ns - 1 - j) if reverse else j
    for k in range(BS):
        idx = BS - 1 - k if reverse else k
        s = blk * BS + idx
        prev = carry[:]
        if shift > 0:
            prev = pltpu.roll(prev, shift, axis=1)
            prev = jnp.where(tcol - t * TT < shift, zero, prev)
        elif shift < 0:
            prev = pltpu.roll(prev, TT + shift, axis=1)
            prev = jnp.where(tcol - t * TT >= TT + shift, zero, prev)
        min_l = jnp.min(prev, axis=0, keepdims=True)
        up = jnp.where(up_edge, _BIG, pltpu.roll(prev, 1, axis=0))
        dn = jnp.where(dn_edge, _BIG, pltpu.roll(prev, D - 1, axis=0))
        cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
        cand = jnp.minimum(cand, min_l + p2)
        c = v_ref[:, idx, :].astype(jnp.float32)
        L = (c + cand) - min_l
        if shift != 0:
            smask = tmask & (s < S_real)
            L = jnp.where(smask, L, zero)
        elif reverse:
            L = jnp.where(s < S_real, L, zero)
        if first:
            out_ref[:, idx, :] = L.astype(out_ref.dtype)
        else:
            out_ref[:, idx, :] = (
                acc_ref[:, idx, :].astype(jnp.float32) + L
            ).astype(out_ref.dtype)
        carry[:] = L

    @pl.when(j == ns - 1)
    def _fin():
        cout_ref[...] = carry[:]


def scan_direction_carry(
    vol,
    acc,
    carry0,
    *,
    S_real: int,
    T_real: int,
    p1: float,
    p2: float,
    reverse: bool,
    shift: int = 0,
    interpret: bool = False,
    step_block: int = 8,
    lane_tile: Optional[int] = None,
):
    """One SGM direction over ``vol`` [D, S, T] seeded with ``carry0``
    [D, T] (the upstream shard's final carry; zeros at a fresh start).
    Returns ``(acc + L_dir, final_carry)`` — the relay primitive for
    :mod:`stepth_tpu.parallel.sgm_pallas_sharded`. Same tiling/clamping
    rules as :func:`_scan_direction`."""
    D, S, T = vol.shape
    BS, TT = _plan_scan_tiling(
        D, S, T, shift=shift, step_block=step_block, lane_tile=lane_tile
    )
    first = acc is None
    kern = functools.partial(
        _scan_kernel_carry,
        BS=BS,
        D=D,
        TT=TT,
        S_real=S_real,
        T_real=T_real,
        p1=float(p1),
        p2=float(p2),
        reverse=reverse,
        shift=shift,
        first=first,
    )
    if reverse:
        imap = lambda t, j, ns=S // BS: (0, ns - 1 - j, t)  # noqa: E731
    else:
        imap = lambda t, j: (0, j, t)  # noqa: E731
    spec = pl.BlockSpec((D, BS, TT), imap)
    cspec = pl.BlockSpec((D, TT), lambda t, j: (0, t))
    in_specs = ([spec] if first else [spec, spec]) + [cspec]
    operands = (vol, carry0) if first else (vol, acc, carry0)
    out, cout = pl.pallas_call(
        kern,
        grid=(T // TT, S // BS),
        in_specs=in_specs,
        out_specs=[spec, cspec],
        out_shape=[
            jax.ShapeDtypeStruct((D, S, T), vol.dtype),
            jax.ShapeDtypeStruct((D, T), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D, TT), jnp.float32)],
        input_output_aliases={} if first else {1: 0},
        interpret=interpret,
    )(*operands)
    return out, cout


def aggregate_pallas(
    vol,
    sgm: SGMConfig,
    p1: float,
    p2: float,
    *,
    S_dims,
    interpret: bool = False,
):
    """All-directions path-cost sum over the padded volume [D, hp, wp].
    ``S_dims = (h, w)`` is the real extent. Matches
    :func:`stepth_tpu.match.sgm.aggregate` bit-for-bit on the real region
    (same recurrence arithmetic, same accumulation order)."""
    h, w = S_dims
    kw = dict(
        p1=p1,
        p2=p2,
        interpret=interpret,
        step_block=sgm.step_block,
        lane_tile=sgm.lane_tile,
    )
    # →x, ←x on the [D, W, H] transpose (scan axis must be axis 1)
    volT = jnp.swapaxes(vol, 1, 2)
    acc = _scan_direction(volT, None, S_real=w, T_real=h, reverse=False, **kw)
    acc = _scan_direction(volT, acc, S_real=w, T_real=h, reverse=True, **kw)
    out = jnp.swapaxes(acc, 1, 2)
    if sgm.directions == 8:
        # Diagonals are transpose-symmetric (predecessor (y−1, x−1) either
        # way), so run them on the orientation with the smaller lateral
        # extent — the whole T axis must fit one VMEM block (no tiling).
        # Both orders below add ↘ ↙ ↗ ↖ exactly like the XLA backend, and
        # like it they accumulate BEFORE the vertical pair (↑y stays the
        # final term — the fused-WTA pipeline depends on that sum order).
        _, hp, wp = vol.shape
        if wp <= hp:
            for rev, sh in ((False, 1), (False, -1), (True, 1), (True, -1)):
                out = _scan_direction(
                    vol, out, S_real=h, T_real=w, reverse=rev, shift=sh, **kw
                )
        else:
            outT = jnp.swapaxes(out, 1, 2)
            for rev, sh in ((False, 1), (True, 1), (False, -1), (True, -1)):
                outT = _scan_direction(
                    volT, outT, S_real=w, T_real=h, reverse=rev, shift=sh, **kw
                )
            out = jnp.swapaxes(outT, 1, 2)
    if sgm.directions >= 4:
        out = _scan_direction(vol, out, S_real=h, T_real=w, reverse=False, **kw)
        out = _scan_direction(vol, out, S_real=h, T_real=w, reverse=True, **kw)
    return out


# ---------------------------------------------------------------------------
# Kernel C: WTA + subpixel + right-view WTA + uniqueness + LR from the volume
# ---------------------------------------------------------------------------


def _wta_kernel(
    v_ref,
    disp_ref,
    dispr_ref,
    cbest_ref,
    valid_ref,
    best,
    bestd,
    cm1,
    cb,
    cp1,
    prevb,
    bestr,
    bestrd,
    second,
    runlag2,
    *,
    DB,
    D,
    TH,
    W,
    Wr,
    lr_threshold,
    uniqueness,
):
    j = pl.program_id(1)
    nd = pl.num_programs(1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    @pl.when(j == 0)
    def _init():
        big = jnp.full((TH, W), _BIG, jnp.float32)
        zero = jnp.zeros((TH, W), jnp.float32)
        best[:] = big
        bestd[:] = jnp.zeros((TH, W), jnp.int32)
        cm1[:] = zero
        cb[:] = big
        cp1[:] = big
        prevb[:] = zero
        bestr[:] = big
        bestrd[:] = jnp.zeros((TH, W), jnp.int32)
        second[:] = big
        runlag2[:] = big

    for k in range(DB):
        d = j * DB + k
        aggc = v_ref[k].astype(jnp.float32)  # [TH, W]

        upd = aggc < best[:]
        is_next = jnp.logical_and(jnp.logical_not(upd), bestd[:] == d - 1)
        cm1[:] = jnp.where(upd, prevb[:], cm1[:])
        cb[:] = jnp.where(upd, aggc, cb[:])
        cp1[:] = jnp.where(is_next, aggc, cp1[:])

        if uniqueness is not None:
            far = jnp.logical_and(jnp.logical_not(upd), d > bestd[:] + 1)
            second[:] = jnp.where(upd, runlag2[:], second[:])
            second[:] = jnp.where(far, jnp.minimum(second[:], aggc), second[:])
            gate_big = (d < 1).astype(jnp.float32) * _BIG
            runlag2[:] = jnp.minimum(runlag2[:], prevb[:] + gate_big)

        best[:] = jnp.where(upd, aggc, best[:])
        bestd[:] = jnp.where(upd, d, bestd[:])
        prevb[:] = aggc

        # right WTA: costR(x) = costL(x+d)
        aggr = pltpu.roll(aggc, (W - d) % W, axis=1)
        aggr = jnp.where(cols > Wr - 1 - d, _BIG, aggr)
        updr = aggr < bestr[:]
        bestr[:] = jnp.where(updr, aggr, bestr[:])
        bestrd[:] = jnp.where(updr, d, bestrd[:])

    @pl.when(j == nd - 1)
    def _epilogue():
        # parabolic subpixel (matches dense.wta)
        bd = bestd[:]
        denom = cm1[:] - 2.0 * cb[:] + cp1[:]
        delta = jnp.where(
            jnp.abs(denom) > 1e-6, (cm1[:] - cp1[:]) / (2.0 * denom), 0.0
        )
        delta = jnp.clip(delta, -0.5, 0.5)
        interior = (bd >= 1) & (bd <= D - 2)
        disp = jnp.where(
            interior, bd.astype(jnp.float32) + delta, bd.astype(jnp.float32)
        )
        disp_ref[:] = disp
        dispr = bestrd[:].astype(jnp.float32)
        dispr_ref[:] = dispr
        cbest_ref[:] = cb[:]

        uok = (
            jnp.ones((TH, W), jnp.float32)
            if uniqueness is None
            else (cb[:] * (1.0 + uniqueness) <= second[:]).astype(jnp.float32)
        )
        if lr_threshold is None:
            valid_ref[:] = uok
        else:
            colf = cols.astype(jnp.float32)
            wmax = jnp.float32(Wr - 1)
            xr = jnp.clip(jnp.round(colf - disp), 0.0, wmax)
            dredge = dispr[:, :1]

            def lr_body(d, ok):
                dr_s = pltpu.roll(dispr, d, axis=1)
                dr_s = jnp.where(cols < d, dredge, dr_s)
                sel = xr == jnp.clip(colf - d.astype(jnp.float32), 0.0, wmax)
                hit = sel & (jnp.abs(disp - dr_s) <= lr_threshold)
                return jnp.maximum(ok, hit.astype(jnp.float32))

            ok = jax.lax.fori_loop(
                0, D, lr_body, jnp.zeros((TH, W), jnp.float32)
            )
            valid_ref[:] = ok * uok


def _wta_from_volume(
    vol, *, Wr: int, cfg: MatchConfig, tile_rows: int = 16, interpret: bool = False
):
    """Run WTA/subpixel/uniqueness/LR over the padded volume [D, hp, wp]."""
    D, hp, wp = vol.shape
    TH = _round_up(tile_rows, 8)
    DB = D
    for cand in (16, 8, 4, 2, 1):
        if D % cand == 0:
            DB = cand
            break
    kern = functools.partial(
        _wta_kernel,
        DB=DB,
        D=D,
        TH=TH,
        W=wp,
        Wr=Wr,
        lr_threshold=None if cfg.lr_threshold is None else float(cfg.lr_threshold),
        uniqueness=None if cfg.uniqueness is None else float(cfg.uniqueness),
    )
    out_spec = pl.BlockSpec((TH, wp), lambda i, j: (i, 0))
    scratch_f = pltpu.VMEM((TH, wp), jnp.float32)
    scratch_i = pltpu.VMEM((TH, wp), jnp.int32)
    return pl.pallas_call(
        kern,
        grid=(hp // TH, D // DB),
        in_specs=[pl.BlockSpec((DB, TH, wp), lambda i, j: (j, i, 0))],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 4,
        scratch_shapes=[
            scratch_f,  # best
            scratch_i,  # bestd
            scratch_f,  # c[d-1]
            scratch_f,  # c[best]
            scratch_f,  # c[d+1]
            scratch_f,  # prev agg
            scratch_f,  # bestR
            scratch_i,  # bestRd
            scratch_f,  # second best (uniqueness)
            scratch_f,  # running min over [0, d-2]
        ],
        interpret=interpret,
    )(vol)


# ---------------------------------------------------------------------------
# Kernel D: final scan direction with WTA fused in (4-direction fast path)
# ---------------------------------------------------------------------------


def _scan_wta_kernel(
    v_ref,
    acc_ref,
    disp_ref,
    dispr_ref,
    cbest_ref,
    uok_ref,
    carry,
    l_scr,
    best,
    bestd,
    cm1,
    cb,
    cp1,
    prevb,
    second,
    runlag2,
    rbest,
    rarg,
    bndv_loc,
    bnda_loc,
    bnd_v,
    bnd_a,
    *,
    BS,
    D,
    TT,
    S_real,
    T_real,
    p1,
    p2,
    uniqueness,
    BND,
):
    """The ↑y (reverse vertical) scan of the 4-direction pipeline with the
    whole WTA epilogue fused into it: per grid step the recurrence writes its
    ``L`` block to VMEM scratch instead of HBM, and a d-loop over
    ``l_scr[d] + acc[d]`` planes runs the exact :func:`_wta_kernel` update
    (running WTA + subpixel neighbors + uniqueness + right-view WTA) — the
    final direction's full-volume HBM write and the WTA kernel's full-volume
    read both disappear, and the arithmetic (order of adds, tie-breaks) is
    bit-identical to the unfused path.

    Right-view WTA across lane tiles: ``bestr(u) = min_d agg(u+d, d)`` reaches
    up to ``D−1`` columns right of ``u``. Lane tiles are processed
    right-to-left (the T grid axis is reversed by the index maps), and the
    contributions a tile owes its LEFT neighbor — exactly the wrapped lanes of
    the per-d roll — accumulate in a per-row boundary scratch
    (``bnd_v/bnd_a``, last ``BND`` lanes) that the neighbor folds in one tile
    later. In-tile candidates carry smaller disparities than boundary ones
    (d < TT−q vs d ≥ TT−q), so the first-minimum tie-break is ``local <=
    boundary``."""
    t = pl.program_id(0)  # reversed: raw t ⇒ logical lane tile nt−1−t
    j = pl.program_id(1)
    ns = pl.num_programs(1)
    nt = pl.num_programs(0)
    t_log = nt - 1 - t

    @pl.when(j == 0)
    def _init():
        carry[:] = jnp.zeros((D, TT), jnp.float32)

    tcol = jax.lax.broadcasted_iota(jnp.int32, (1, TT), 1) + t_log * TT
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TT), 1)
    drow = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    up_edge = drow == 0
    dn_edge = drow == D - 1

    blk = ns - 1 - j  # reverse scan
    # ---- recurrence (identical to _scan_kernel, reverse, shift=0) ----
    for k in range(BS):
        idx = BS - 1 - k
        s = blk * BS + idx
        prev = carry[:]
        min_l = jnp.min(prev, axis=0, keepdims=True)
        up = jnp.where(up_edge, _BIG, pltpu.roll(prev, 1, axis=0))
        dn = jnp.where(dn_edge, _BIG, pltpu.roll(prev, D - 1, axis=0))
        cand = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
        cand = jnp.minimum(cand, min_l + p2)
        c = v_ref[:, idx, :].astype(jnp.float32)
        L = (c + cand) - min_l
        L = jnp.where(s < S_real, L, 0.0)
        l_scr[:, idx, :] = L
        carry[:] = L

    # ---- fused WTA over the block's rows ----
    big2d = jnp.full((BS, TT), _BIG, jnp.float32)
    zero2d = jnp.zeros((BS, TT), jnp.float32)
    best[:] = big2d
    bestd[:] = jnp.zeros((BS, TT), jnp.int32)
    cm1[:] = zero2d
    cb[:] = big2d
    cp1[:] = big2d
    prevb[:] = zero2d
    rbest[:] = big2d
    rarg[:] = jnp.zeros((BS, TT), jnp.float32)
    bndv_loc[:] = big2d
    bnda_loc[:] = jnp.zeros((BS, TT), jnp.float32)
    if uniqueness is not None:
        second[:] = big2d
        runlag2[:] = big2d

    src_bad = tcol >= T_real  # source column out of image (for right WTA)

    # static unroll over d: the per-d lane rolls and in-tile masks become
    # compile-time shuffles/constants (a fori_loop's dynamic-shift rolls
    # measured ~3x the standalone WTA kernel's static ones)
    for d in range(D):
        aggc = l_scr[d] + acc_ref[d].astype(jnp.float32)  # [BS, TT]

        upd = aggc < best[:]
        is_next = jnp.logical_and(jnp.logical_not(upd), bestd[:] == d - 1)
        cm1[:] = jnp.where(upd, prevb[:], cm1[:])
        cb[:] = jnp.where(upd, aggc, cb[:])
        cp1[:] = jnp.where(is_next, aggc, cp1[:])

        if uniqueness is not None:
            far = jnp.logical_and(jnp.logical_not(upd), d > bestd[:] + 1)
            second[:] = jnp.where(upd, runlag2[:], second[:])
            second[:] = jnp.where(far, jnp.minimum(second[:], aggc), second[:])
            if d < 1:
                runlag2[:] = jnp.minimum(runlag2[:], prevb[:] + _BIG)
            else:
                runlag2[:] = jnp.minimum(runlag2[:], prevb[:])

        best[:] = jnp.where(upd, aggc, best[:])
        bestd[:] = jnp.where(upd, d, bestd[:])
        prevb[:] = aggc

        # right WTA: in-tile lanes q < TT−d sample this tile; wrapped lanes
        # q ≥ TT−d are the left neighbor's candidates at the same q
        rolled = pltpu.roll(jnp.where(src_bad, _BIG, aggc), (TT - d) % TT, axis=1)
        intile = q_iota < TT - d
        updr = jnp.logical_and(intile, rolled < rbest[:])
        rbest[:] = jnp.where(updr, rolled, rbest[:])
        rarg[:] = jnp.where(updr, jnp.float32(d), rarg[:])
        if d > 0:  # d=0 has no wrapped lanes
            bupd = jnp.logical_and(jnp.logical_not(intile), rolled < bndv_loc[:])
            bndv_loc[:] = jnp.where(bupd, rolled, bndv_loc[:])
            bnda_loc[:] = jnp.where(bupd, jnp.float32(d), bnda_loc[:])

    row0 = pl.multiple_of(blk * BS, 8)

    # fold in the right neighbor's boundary candidates (all have d ≥ TT−q >
    # any in-tile d, so ties keep the local value)
    @pl.when(t > 0)
    def _merge():
        pv = bnd_v[pl.ds(row0, BS), :]
        pa = bnd_a[pl.ds(row0, BS), :]
        rb_hi = rbest[:, TT - BND :]
        ra_hi = rarg[:, TT - BND :]
        take = rb_hi <= pv
        rbest[:, TT - BND :] = jnp.where(take, rb_hi, pv)
        rarg[:, TT - BND :] = jnp.where(take, ra_hi, pa)

    bnd_v[pl.ds(row0, BS), :] = bndv_loc[:, TT - BND :]
    bnd_a[pl.ds(row0, BS), :] = bnda_loc[:, TT - BND :]

    # ---- epilogue: subpixel + uniqueness gate, block writes ----
    bd = bestd[:]
    denom = cm1[:] - 2.0 * cb[:] + cp1[:]
    delta = jnp.where(
        jnp.abs(denom) > 1e-6, (cm1[:] - cp1[:]) / (2.0 * denom), 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (bd >= 1) & (bd <= D - 2)
    disp = jnp.where(
        interior, bd.astype(jnp.float32) + delta, bd.astype(jnp.float32)
    )
    disp_ref[:] = disp
    dispr_ref[:] = rarg[:]
    cbest_ref[:] = cb[:]
    uok_ref[:] = (
        jnp.ones((BS, TT), jnp.float32)
        if uniqueness is None
        else (cb[:] * (1.0 + uniqueness) <= second[:]).astype(jnp.float32)
    )


def _scan_wta_direction(
    vol,
    acc,
    *,
    S_real: int,
    T_real: int,
    p1: float,
    p2: float,
    cfg: MatchConfig,
    interpret: bool = False,
    step_block: int = 8,
    lane_tile: Optional[int] = None,
):
    """Reverse axis-1 scan over ``vol`` [D, S, T] accumulating onto ``acc``,
    with WTA fused (see :func:`_scan_wta_kernel`). Returns
    ``(disp, dispr, cbest, uok)`` as f32[S, T] padded maps."""
    D, S, T = vol.shape
    BS = step_block if S % step_block == 0 else 8
    cap = 512 if lane_tile is None else lane_tile
    if cap < 128:
        raise ValueError(
            f"lane_tile cap must be >= 128 (one lane register), got {cap}"
        )
    TT = 128
    for cand in range(cap // 128 * 128, 127, -128):
        if T % cand == 0:
            TT = cand
            break
    BND = min(128, TT)
    if D > BND:
        raise ValueError(f"D={D} exceeds the {BND}-lane boundary band")
    # Scoped-VMEM clamp (same estimate as _scan_direction's): the two
    # double-buffered [D, BS, TT] inputs plus the L-block scratch exceed the
    # 16 MB scoped limit at D=128/BS=16/TT=512 (observed 21.9 MB → AOT
    # compile OOM); halving BS fits with the D=64 sweep optimum untouched.
    while BS > 1 and 6 * D * BS * TT * 4 > 14 * 1024 * 1024:
        BS //= 2
    while S % BS:
        BS //= 2
    kern = functools.partial(
        _scan_wta_kernel,
        BS=BS,
        D=D,
        TT=TT,
        S_real=S_real,
        T_real=T_real,
        p1=float(p1),
        p2=float(p2),
        uniqueness=None if cfg.uniqueness is None else float(cfg.uniqueness),
        BND=BND,
    )
    nt = T // TT
    ns = S // BS
    # T grid axis reversed: lane tiles run right-to-left so the right-WTA
    # boundary scratch is written before its (left) consumer reads it
    imap = lambda t, j, ns=ns, nt=nt: (0, ns - 1 - j, nt - 1 - t)  # noqa: E731
    omap = lambda t, j, ns=ns, nt=nt: (ns - 1 - j, nt - 1 - t)  # noqa: E731
    out2d = pl.BlockSpec((BS, TT), omap)
    sc_f = pltpu.VMEM((BS, TT), jnp.float32)
    sc_i = pltpu.VMEM((BS, TT), jnp.int32)
    disp, dispr, cbest, uok = pl.pallas_call(
        kern,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((D, BS, TT), imap),
            pl.BlockSpec((D, BS, TT), imap),
        ],
        out_specs=[out2d] * 4,
        out_shape=[jax.ShapeDtypeStruct((S, T), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((D, TT), jnp.float32),  # carry
            pltpu.VMEM((D, BS, TT), jnp.float32),  # L block
            sc_f,  # best
            sc_i,  # bestd
            sc_f,  # cm1
            sc_f,  # cb
            sc_f,  # cp1
            sc_f,  # prevb
            sc_f,  # second
            sc_f,  # runlag2
            sc_f,  # rbest
            sc_f,  # rarg
            sc_f,  # bnd val (local)
            sc_f,  # bnd arg (local)
            pltpu.VMEM((S, BND), jnp.float32),  # bnd val (cross-tile)
            pltpu.VMEM((S, BND), jnp.float32),  # bnd arg (cross-tile)
        ],
        interpret=interpret,
    )(vol, acc)
    return disp, dispr, cbest, uok


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "sgm", "tile_rows", "interpret")
)
def match_pair_sgm_pallas(
    left,
    right,
    cfg: MatchConfig = MatchConfig(),
    sgm: SGMConfig = SGMConfig(),
    tile_rows: int = 16,
    interpret: Optional[bool] = None,
) -> dense.MatchResult:
    """All-Pallas twin of :func:`stepth_tpu.match.sgm.match_pair_sgm` —
    same output contract, same numerics (tested equal)."""
    from stepth_tpu.match import pallas_post

    interpret = _default_interpret(interpret)
    if cfg.cost not in ("sad", "ssd", "census"):
        raise NotImplementedError(f"pallas sgm: cost {cfg.cost!r} unsupported")
    if sgm.directions not in (2, 4, 8):
        raise ValueError(f"directions must be 2, 4 or 8, got {sgm.directions}")
    if sgm.volume_dtype not in ("f32", "bf16"):
        raise ValueError(f"volume_dtype must be 'f32' or 'bf16', got {sgm.volume_dtype!r}")
    vdtype = jnp.bfloat16 if sgm.volume_dtype == "bf16" else jnp.float32
    lg = dense.grayscale(left)
    rg = dense.grayscale(right)
    h, w = lg.shape
    vol, (h, w, hp, wp) = _aggregated_volume(
        lg, rg, cfg, tile_rows, interpret, dtype=vdtype
    )
    scale = float(cfg.window * cfg.window) if cfg.window > 1 else 1.0
    p1s, p2s = sgm.p1 * scale, sgm.p2 * scale
    # The fused-WTA final scan relays right-view candidates through a
    # 128-lane boundary band, so it requires D <= 128; larger disparity
    # ranges take the unfused aggregate + standalone-WTA path below.
    if sgm.directions in (4, 8) and vol.shape[0] <= 128:
        # fast path: the final (↑y) direction runs with WTA fused in — the
        # last full-volume write and the WTA kernel's full-volume read both
        # vanish (measured ~2.5 ms of the 18 ms round-3 pipeline), with
        # bit-identical arithmetic to the unfused path for f32 volumes
        # (with volume_dtype="bf16" the unfused path rounds the final
        # direction's accumulation to bf16 before WTA while the fused kernel
        # keeps it in f32 — equal within the bf16-close contract, not
        # bit-equal). LR validity runs on
        # the two 2-D disparity maps afterwards (pallas_post twin of
        # dense.lr_consistency — the same predicate the fused-out WTA kernel
        # evaluated inline). For 8 directions the diagonals accumulate
        # between the horizontal and vertical pairs (sgm.aggregate uses the
        # same order, so f32 sums stay bit-identical across backends) and ↑y
        # remains the final, fused scan.
        kw = dict(p1=p1s, p2=p2s, interpret=interpret,
                  step_block=sgm.step_block, lane_tile=sgm.lane_tile)
        volT = jnp.swapaxes(vol, 1, 2)
        acc = _scan_direction(volT, None, S_real=w, T_real=h, reverse=False, **kw)
        acc = _scan_direction(volT, acc, S_real=w, T_real=h, reverse=True, **kw)
        if sgm.directions == 8:
            # same orientation choice + per-branch order as aggregate_pallas
            # (the whole lateral axis must fit one VMEM block for diagonals)
            _, hp_, wp_ = vol.shape
            if wp_ <= hp_:
                accN = jnp.swapaxes(acc, 1, 2)
                for rev, sh in ((False, 1), (False, -1), (True, 1), (True, -1)):
                    accN = _scan_direction(vol, accN, S_real=h, T_real=w,
                                           reverse=rev, shift=sh, **kw)
            else:
                for rev, sh in ((False, 1), (True, 1), (False, -1), (True, -1)):
                    acc = _scan_direction(volT, acc, S_real=w, T_real=h,
                                          reverse=rev, shift=sh, **kw)
                accN = jnp.swapaxes(acc, 1, 2)
        else:
            accN = jnp.swapaxes(acc, 1, 2)
        accN = _scan_direction(vol, accN, S_real=h, T_real=w, reverse=False, **kw)
        disp_p, dispr_p, cbest_p, uok_p = _scan_wta_direction(
            vol, accN, S_real=h, T_real=w, p1=p1s, p2=p2s, cfg=cfg,
            interpret=interpret, step_block=sgm.step_block,
            lane_tile=sgm.lane_tile,
        )
        disp = disp_p[:h, :w]
        cbest = cbest_p[:h, :w]
        valid = uok_p[:h, :w] > 0.5
        if cfg.lr_threshold is not None:
            lr_ok = pallas_post.lr_consistency_pallas(
                disp, dispr_p[:h, :w], float(cfg.lr_threshold),
                num_disparities=cfg.num_disparities, interpret=interpret,
            )
            valid = jnp.logical_and(valid, lr_ok)
    else:
        agg = aggregate_pallas(
            vol,
            sgm,
            p1s,
            p2s,
            S_dims=(h, w),
            interpret=interpret,
        )
        disp, _, cbest, valid_f = _wta_from_volume(
            agg, Wr=w, cfg=cfg, tile_rows=tile_rows, interpret=interpret
        )
        disp = disp[:h, :w]
        cbest = cbest[:h, :w]
        valid = valid_f[:h, :w] > 0.5
    disp = pallas_post.fill_invalid_pallas(disp, valid, interpret=interpret)
    disp = pallas_post.median3_pallas(disp, interpret=interpret)
    return dense.MatchResult(disparity=disp, valid=valid, cost=cbest)
