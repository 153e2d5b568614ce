"""Pallas post-processing kernels.

The XLA 3×3 median (`dense.median3`) materializes a 9-deep stack and sorts it
(~4.8 ms at 1080p — more than half the whole hierarchical matcher). This
kernel computes the median in VMEM with the classic 19-exchange median-of-9
network over masked rolls: ~40 vector ops, one pass over the image.
Edge behavior matches ``jnp.pad(mode="edge")``: an out-of-image neighbor
contributes the center value (clip-indexing replicates the border pixel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# the 19-comparator median-of-9 sorting network (Smith); pairs (lo, hi)
_MEDIAN9_NET = [
    (1, 2), (4, 5), (7, 8),
    (0, 1), (3, 4), (6, 7),
    (1, 2), (4, 5), (7, 8),
    (0, 3), (5, 8), (4, 7),
    (3, 6), (1, 4), (2, 5),
    (4, 7), (4, 2), (6, 4),
    (4, 2),
]


def _median9(vals):
    p = list(vals)
    for a, b in _MEDIAN9_NET:
        lo = jnp.minimum(p[a], p[b])
        hi = jnp.maximum(p[a], p[b])
        p[a], p[b] = lo, hi
    return p[4]


def _median_kernel(x_hbm, out_ref, *, H, W, Hr, Wr, TH, RV):
    S = TH + 2 * RV
    i = pl.program_id(0)
    start = pl.multiple_of(jnp.clip(i * TH - RV, 0, H - S), 8)
    center0 = i * TH - start

    def body(slab, sem):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(start, S)], slab, sem)
        cp.start()
        cp.wait()
        x = slab[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

        shifted = []
        for dy in (-1, 0, 1):
            rowed = pltpu.roll(x, (-dy) % S, axis=0)
            # out-of-image row → replicate center (clip-index semantics)
            ok_r = (rows + dy >= 0) & (rows + dy < S)
            ok_r &= (start + rows + dy >= 0) & (start + rows + dy < Hr)
            rowed = jnp.where(ok_r, rowed, x)
            for dx in (-1, 0, 1):
                s = pltpu.roll(rowed, (-dx) % W, axis=1)
                ok_c = (cols + dx >= 0) & (cols + dx < Wr)
                s = jnp.where(ok_c, s, rowed)
                shifted.append(s)

        med = _median9(shifted)
        out_ref[:] = pltpu.roll(med, (S - center0) % S, axis=0)[:TH]

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((S, W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


def _lr_kernel(x_hbm, y_hbm, out_ref, *, W, Wr, D, TH, threshold):
    """Row-tile LR sweep: valid(x) ⇔ |dL(x) − dR(round(x−dL(x)))| ≤ threshold,
    evaluated gather-free as static-shift selections (same formulation as
    dense.lr_consistency). The swept shift range is bounded per slab by
    [⌊min dL⌋, ⌈max dL⌉] — the selector ``round(x−dL) == x−d`` can only fire
    for d within one of dL's rounded range — so smooth scenes sweep a few
    dozen shifts instead of all D (worst case unchanged)."""
    i = pl.program_id(0)
    start = pl.multiple_of(i * TH, 8)

    def body(dl_slab, dr_slab, sem_l, sem_r):
        cp_l = pltpu.make_async_copy(x_hbm.at[pl.ds(start, TH)], dl_slab, sem_l)
        cp_r = pltpu.make_async_copy(y_hbm.at[pl.ds(start, TH)], dr_slab, sem_r)
        cp_l.start()
        cp_r.start()
        cp_l.wait()
        cp_r.wait()
        dl = dl_slab[:]
        dr = dr_slab[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        colf = cols.astype(jnp.float32)
        wmax = jnp.float32(Wr - 1)
        xr = jnp.clip(jnp.round(colf - dl), 0.0, wmax)
        dredge = dr[:, :1]

        dlo = jnp.clip(jnp.floor(jnp.min(dl)).astype(jnp.int32) - 1, 0, D)
        dhi = jnp.clip(jnp.ceil(jnp.max(dl)).astype(jnp.int32) + 2, 0, D)

        def lr_body(d, carry):
            ok, dr_rot = carry  # dr_rot = roll(dr, d), advanced incrementally
            dr_s = jnp.where(cols < d, dredge, dr_rot)
            sel = xr == jnp.clip(colf - d.astype(jnp.float32), 0.0, wmax)
            hit = sel & (jnp.abs(dl - dr_s) <= threshold)
            return (
                jnp.maximum(ok, hit.astype(jnp.float32)),
                pltpu.roll(dr_rot, 1, axis=1),
            )

        ok, _ = jax.lax.fori_loop(
            dlo, dhi, lr_body,
            (jnp.zeros((TH, W), jnp.float32), pltpu.roll(dr, dlo, axis=1)),
        )
        out_ref[:] = ok

    pl.run_scoped(
        body,
        dl_slab=pltpu.VMEM((TH, W), jnp.float32),
        dr_slab=pltpu.VMEM((TH, W), jnp.float32),
        sem_l=pltpu.SemaphoreType.DMA,
        sem_r=pltpu.SemaphoreType.DMA,
    )


def _fill_kernel(d_hbm, v_hbm, out_ref, *, W, TH):
    """Scanline occlusion fill (twin of dense.fill_invalid): each invalid
    pixel takes the nearer (smaller) of the nearest valid disparities to its
    left and right. The XLA ``associative_scan`` version lowers to ~2·log₂(W)
    unfused full-resolution pad/slice HBM round-trips (~5 ms at 1080p — it
    dominated the whole matcher); here the scans are log-shift propagations
    over the VMEM-resident slab."""
    i = pl.program_id(0)
    start = pl.multiple_of(i * TH, 8)

    def body(d_slab, v_slab, sem_d, sem_v):
        cp_d = pltpu.make_async_copy(d_hbm.at[pl.ds(start, TH)], d_slab, sem_d)
        cp_v = pltpu.make_async_copy(v_hbm.at[pl.ds(start, TH)], v_slab, sem_v)
        cp_d.start()
        cp_v.start()
        cp_d.wait()
        cp_v.wait()
        disp = d_slab[:]
        valid = v_slab[:] > 0.5
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def propagate(rightward):
            # carry the most recent valid value in the scan direction via
            # doubling shifts; padded columns carry valid=False so they never
            # contribute (matching the unsharded scan over real columns only).
            # "has a value" is carried as f32 — Mosaic cannot rotate i1 vectors
            v = jnp.where(valid, disp, 0.0)
            h = valid.astype(jnp.float32)
            k = 1
            while k < W:
                if rightward:  # value flows left → right
                    vs = pltpu.roll(v, k, axis=1)
                    hs = pltpu.roll(h, k, axis=1) * (cols >= k)
                else:
                    vs = pltpu.roll(v, (W - k) % W, axis=1)
                    hs = pltpu.roll(h, (W - k) % W, axis=1) * (cols < W - k)
                take = (h == 0.0) & (hs > 0.0)
                v = jnp.where(take, vs, v)
                h = jnp.maximum(h, hs)
                k *= 2
            return jnp.where(h > 0.0, v, jnp.inf)

        left_fill = propagate(True)
        right_fill = propagate(False)
        fill = jnp.minimum(left_fill, right_fill)
        fill = jnp.where(jnp.isfinite(fill), fill, 0.0)
        out_ref[:] = jnp.where(valid, disp, fill)

    pl.run_scoped(
        body,
        d_slab=pltpu.VMEM((TH, W), jnp.float32),
        v_slab=pltpu.VMEM((TH, W), jnp.float32),
        sem_d=pltpu.SemaphoreType.DMA,
        sem_v=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fill_invalid_pallas(
    disp, valid, tile_rows: int = 64, interpret: Optional[bool] = None
) -> jax.Array:
    """Drop-in twin of :func:`stepth_tpu.match.dense.fill_invalid` (bit-exact:
    both are pure selects over the same values)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    disp = jnp.asarray(disp, jnp.float32)
    h, w = disp.shape
    tile_rows = _round_up(tile_rows, 8)
    wp = _round_up(w, 128)
    hp = _round_up(h, tile_rows)
    d_p = jnp.pad(disp, ((0, hp - h), (0, wp - w)))
    # pad validity with False: padded columns must not seed fills
    v_p = jnp.pad(valid.astype(jnp.float32), ((0, hp - h), (0, wp - w)))
    kern = functools.partial(_fill_kernel, W=wp, TH=tile_rows)
    out = pl.pallas_call(
        kern,
        grid=(hp // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(d_p, v_p)
    return out[:h, :w]


@functools.partial(
    jax.jit, static_argnames=("num_disparities", "threshold", "tile_rows", "interpret")
)
def lr_consistency_pallas(
    disp_l,
    disp_r,
    threshold: float = 1.0,
    num_disparities: int = 128,
    tile_rows: int = 64,
    interpret: Optional[bool] = None,
):
    """Pallas twin of :func:`stepth_tpu.match.dense.lr_consistency` (bool[H,W])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    disp_l = jnp.asarray(disp_l, jnp.float32)
    disp_r = jnp.asarray(disp_r, jnp.float32)
    h, w = disp_l.shape
    tile_rows = _round_up(tile_rows, 8)
    wp = _round_up(w, 128)
    hp = _round_up(h, tile_rows)
    dl_p = jnp.pad(disp_l, ((0, hp - h), (0, wp - w)), mode="edge")
    dr_p = jnp.pad(disp_r, ((0, hp - h), (0, wp - w)), mode="edge")
    kern = functools.partial(
        _lr_kernel, W=wp, Wr=w, D=num_disparities, TH=tile_rows,
        threshold=float(threshold),
    )
    out = pl.pallas_call(
        kern,
        grid=(hp // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(dl_p, dr_p)
    return out[:h, :w] > 0.5


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def median3_pallas(
    x, tile_rows: int = 64, interpret: Optional[bool] = None
) -> jax.Array:
    """Drop-in twin of :func:`stepth_tpu.match.dense.median3` (f32[H, W])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(x, jnp.float32)
    h, w = x.shape
    RV = 8  # 1-row halo rounded to the sublane tile
    tile_rows = _round_up(tile_rows, 8)
    wp = _round_up(w, 128)
    hp = _round_up(h, tile_rows)
    if hp < tile_rows + 2 * RV:
        hp = _round_up(tile_rows + 2 * RV, tile_rows)
    xp = jnp.pad(x, ((0, hp - h), (0, wp - w)), mode="edge")

    kern = functools.partial(
        _median_kernel, H=hp, W=wp, Hr=h, Wr=w, TH=tile_rows, RV=RV
    )
    out = pl.pallas_call(
        kern,
        grid=(hp // tile_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tile_rows, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(xp)
    return out[:h, :w]
