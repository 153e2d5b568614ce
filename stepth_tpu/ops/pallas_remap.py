"""Pallas TPU bilinear remap: gather-free image warping for rig-constant maps.

Round-2 VERDICT #5: the production loop (images → pose → rectify → dense
depth) had exactly one host-punted stage — ``ops.rectify.remap_bilinear``
routes per-pixel gathers through the TPU scalar core (``map_coordinates``).
This kernel keeps the warp device-resident using the same roll-not-gather
decomposition as :mod:`stepth_tpu.match.pallas_refine`:

Rectification maps are *smooth*: within a (tile_rows × 128-lane) output tile
the integer source offsets ``floor(map)`` span a few pixels around a per-tile
base. A host-side **plan** (built once per rig from the concrete maps)
records, per tile, an integer base sample position and the *static*
worst-case in-tile candidate counts ``(Noy, Nox)``. In-kernel, every
candidate integer offset then becomes a static roll of a VMEM-resident
source band:

    out[i, j] = Σ_{oy=0}^{Noy} Σ_{ox=0}^{Nox}
                  cY[oy](i,j) · cX[ox](i,j) · src[by + i + oy, bx + j + ox]

where ``cY[oy] = (dy==oy)·(1−fy) + (dy==oy−1)·fy`` (and cX alike) are the
bilinear weights routed to the right candidate — nonzero for exactly two
(oy, ox) pairs per pixel. Rolls are incremental (one static roll-by-1 per
candidate step, after one dynamic pre-roll per tile), so Mosaic sees only
aligned vector ops; there is no gather anywhere.

Numerics: identical neighbor weights to ``jax.scipy.ndimage.map_coordinates``
(order=1), but different summation order — outputs match to f32 rounding
(tested in tests/test_pallas_remap.py). Out-of-image samples are masked to
``fill`` by the XLA wrapper exactly like
:func:`stepth_tpu.ops.rectify.remap_bilinear`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TW = 128  # lane-tile width
_CW = 512  # source block width per column tile (pre-roll headroom, see module doc)
_OOB = 256.0  # out-of-image samples keep extrapolated positions within ± this band


def _round_up(x, m):
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class RemapSpec:
    """Static (hashable) half of a remap plan — everything that shapes the
    kernel. One spec per rig; jit caches per spec."""

    h: int  # output rows
    w: int  # output cols
    sh: int  # source rows
    sw: int  # source cols
    tile_rows: int
    noy: int  # max candidate row offset (candidates oy ∈ [0, noy])
    nox: int  # max candidate col offset
    sr: int  # source block rows per tile (≥ tile_rows + noy + 1, 8-aligned)
    bh: int  # source band rows DMA'd per row strip
    pry: int  # source padding rows (top)
    prx: int  # source padding cols (left)
    hp_src: int  # padded source height
    wp_src: int  # padded source width


class RemapPlan(NamedTuple):
    """Device half of a remap plan. ``base_y``/``base_x`` are *padded-source*
    coordinates of the (oy=0, ox=0) candidate for the tile's (row 0, col 0)
    pixel; ``band_y0`` is the first padded-source row of each strip's band."""

    base_y: jax.Array  # i32[nr, nc], 8-aligned
    base_x: jax.Array  # i32[nr, nc]
    band_y0: jax.Array  # i32[nr], 8-aligned
    ymap: jax.Array  # f32[hp, wp] padded copy of the (smoothly clipped) y map
    xmap: jax.Array  # f32[hp, wp]
    inb: jax.Array  # bool[h, w] — sample inside the source (from the RAW map)


def plan_remap(map_xy, source_shape: Tuple[int, int], tile_rows: int = 32):
    """Build a (RemapSpec, RemapPlan) pair from a *concrete* sample map.

    ``map_xy``: f32[H, W, 2] (x, y source coordinates — the
    :class:`stepth_tpu.ops.rectify.RectifyMaps` convention).
    ``source_shape``: (H_src, W_src) of the image the map samples.
    Maps are rig-constant, so this host-side pass runs once per rig.
    """
    m = np.asarray(map_xy, np.float32)
    sh, sw = int(source_shape[0]), int(source_shape[1])
    h, w = m.shape[0], m.shape[1]
    tile_rows = _round_up(max(tile_rows, 8), 8)
    hp = _round_up(h, tile_rows)
    wp = _round_up(w, _TW)
    nr, nc = hp // tile_rows, wp // _TW

    # The in-bounds mask comes from the RAW map; the maps the kernel sees are
    # then smoothed for plan tightness. Clipping out-of-image samples to the
    # image border would create a fake 128-px/row offset ramp wherever the
    # clip flattens the map (measured: nox 86 → 10 on a real rectification
    # map), so out-of-image samples keep their *extrapolated* positions,
    # bounded to a ±_OOB band the source padding covers. Non-finite map
    # values (horizon singularities) fall back to the identity position —
    # they are masked anyway, identity keeps the in-tile spread at zero.
    xr = m[..., 0]
    yr = m[..., 1]
    inb = (
        np.isfinite(xr) & np.isfinite(yr)
        & (xr >= 0) & (xr <= sw - 1) & (yr >= 0) & (yr <= sh - 1)
    )
    ii = np.arange(hp)[:, None]
    jj = np.arange(wp)[None, :]
    x = np.where(np.isfinite(xr), np.clip(xr, -_OOB, sw + _OOB), jj[:, :w][:h])
    y = np.where(np.isfinite(yr), np.clip(yr, -_OOB, sh + _OOB), ii[:h][:, :1] + np.zeros_like(yr))
    # pad with a *unit-slope* extension (edge value + distance), not edge:
    # edge padding makes the per-pixel offset ``map − pixel`` ramp across the
    # padded span and blows up the in-tile spread for nothing (padded outputs
    # are cropped; their samples just have to stay inside the padded source)
    x = np.pad(x, ((0, hp - h), (0, wp - w)), mode="edge")
    y = np.pad(y, ((0, hp - h), (0, wp - w)), mode="edge")
    x = x + np.maximum(jj - (w - 1), 0)
    y = y + np.maximum(ii - (h - 1), 0)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)

    ry = (y0 - ii).reshape(nr, tile_rows, nc, _TW)  # row offset per pixel
    rx = (x0 - jj).reshape(nr, tile_rows, nc, _TW)
    by = ry.min(axis=(1, 3))  # [nr, nc]
    bx = rx.min(axis=(1, 3))

    pry = _round_up(max(0, -int(by.min())) + 8, 8)
    prx = _round_up(max(0, -int(bx.min())) + 1, _TW)

    # absolute padded-source position of each tile's (oy=0, ox=0) candidate
    # for its local (row 0, col 0) pixel: the per-tile min offset plus the
    # tile's own global origin
    base_y_p = by + (np.arange(nr) * tile_rows)[:, None] + pry
    base_y = (base_y_p // 8) * 8  # 8-aligned; slack absorbed into noy
    base_x = bx + (np.arange(nc) * _TW)[None, :] + prx
    # candidates: dy = y0_pad − base_y − i_local ∈ [0, noy−1]; +1 for the
    # y0+1 neighbor ⇒ oy ranges over [0, noy]
    noy = int(
        (ry.max(axis=(1, 3)) + (np.arange(nr) * tile_rows)[:, None] + pry
         - base_y).max()
    ) + 1
    nox = int(
        (rx.max(axis=(1, 3)) + (np.arange(nc) * _TW)[None, :] + prx
         - base_x).max()
    ) + 1
    if nox > _CW - 2 * _TW:
        raise ValueError(
            f"in-tile column spread {nox} too large for the {_CW} block — "
            "this map is not smooth enough for the roll decomposition"
        )

    sr = _round_up(tile_rows + noy + 1, 8)
    band_y0 = base_y.min(axis=1)  # [nr], 8-aligned
    bh = int((base_y - band_y0[:, None]).max()) + sr

    hp_src = max(int(band_y0.max()) + bh + 8, sh + pry)
    wp_src = _round_up(
        max(sw + prx + 1, int((base_x + (_TW - 1) + nox).max()) + 1) + _CW, _TW
    )

    spec = RemapSpec(
        h=h, w=w, sh=sh, sw=sw, tile_rows=tile_rows, noy=noy, nox=nox,
        sr=sr, bh=bh, pry=pry, prx=prx, hp_src=hp_src, wp_src=wp_src,
    )
    plan = RemapPlan(
        base_y=jnp.asarray(base_y, jnp.int32),
        base_x=jnp.asarray(base_x, jnp.int32),
        band_y0=jnp.asarray(band_y0, jnp.int32),
        ymap=jnp.asarray(y, jnp.float32),
        xmap=jnp.asarray(x, jnp.float32),
        inb=jnp.asarray(inb),
    )
    return spec, plan


def _remap_kernel(
    base_y_ref,  # SMEM i32[nr, nc]
    base_x_ref,  # SMEM i32[nr, nc]
    band_y0_ref,  # SMEM i32[nr]
    src_hbm,  # ANY f32[hp_src, wp_src]
    ymap_ref,  # VMEM f32[TH, wp]
    xmap_ref,  # VMEM f32[TH, wp]
    out_ref,  # VMEM f32[TH, wp]
    band,  # VMEM f32[BH, wp_src]
    cy_s,  # VMEM f32[NOY+1, TH, TW]
    sem,
    *,
    TH,
    NOY,
    NOX,
    SR,
    BH,
    PRY,
    PRX,
    nc,
):
    i = pl.program_id(0)
    y0b = pl.multiple_of(band_y0_ref[i], 8)
    cp = pltpu.make_async_copy(src_hbm.at[pl.ds(y0b, BH)], band, sem)
    cp.start()
    cp.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH, _TW), 1)

    def col_tile(jc, _):
        by = base_y_ref[i, jc]
        bx = base_x_ref[i, jc]
        ym = ymap_ref[:, pl.ds(jc * _TW, _TW)]
        xm = xmap_ref[:, pl.ds(jc * _TW, _TW)]
        y0 = jnp.floor(ym)
        x0 = jnp.floor(xm)
        fy = ym - y0
        fx = xm - x0
        # candidate index of each pixel's y0/x0 sample (plan guarantees
        # dy ∈ [0, NOY−1], dx ∈ [0, NOX−1]; the +1 neighbors are dy+1/dx+1)
        dy = y0.astype(jnp.int32) + PRY - by - rows
        dx = x0.astype(jnp.int32) + PRX - bx - cols

        # bilinear row weights per candidate, hoisted out of the ox loop
        for oy in range(NOY + 1):
            cy_s[oy] = (dy == oy).astype(jnp.float32) * (1.0 - fy) + (
                dy == (oy - 1)
            ).astype(jnp.float32) * fy

        # source block rows [by−y0b, by−y0b+SR), cols [A, A+CW); pre-roll so
        # candidate ox=0 for pixel j sits at block col j
        r0 = pl.multiple_of(by - y0b, 8)
        A = pl.multiple_of((bx // _TW) * _TW, _TW)
        blk = band[pl.ds(r0, SR), pl.ds(A, _CW)]
        blk = pltpu.roll(blk, (-(bx - A)) % _CW, axis=1)

        acc = jnp.zeros((TH, _TW), jnp.float32)
        for ox in range(NOX + 1):
            if ox > 0:
                blk = pltpu.roll(blk, _CW - 1, axis=1)  # col j ← col j+1
            cx = (dx == ox).astype(jnp.float32) * (1.0 - fx) + (
                dx == (ox - 1)
            ).astype(jnp.float32) * fx
            sub = blk[:, :_TW]
            for oy in range(NOY + 1):
                if oy > 0:
                    sub = pltpu.roll(sub, SR - 1, axis=0)  # row r ← row r+1
                acc = acc + cx * (cy_s[oy] * sub[:TH])
        out_ref[:, pl.ds(jc * _TW, _TW)] = acc
        return 0

    jax.lax.fori_loop(0, nc, col_tile, 0)


@functools.partial(jax.jit, static_argnames=("spec", "fill", "interpret"))
def remap_bilinear_pallas(
    img,
    spec: RemapSpec,
    plan: RemapPlan,
    fill: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Bilinear warp of ``img`` (f32[H_src, W_src] or [..., C]) through a
    precomputed remap plan, entirely on-device. Matches
    :func:`stepth_tpu.ops.rectify.remap_bilinear` to f32 rounding inside the
    image and exactly on the ``fill`` mask."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 3:
        planes = [
            remap_bilinear_pallas(img[..., c], spec, plan, fill, interpret)
            for c in range(img.shape[-1])
        ]
        return jnp.stack(planes, axis=-1)
    if img.shape != (spec.sh, spec.sw):
        raise ValueError(
            f"image shape {img.shape} != plan source {(spec.sh, spec.sw)}"
        )
    TH = spec.tile_rows
    hp = _round_up(spec.h, TH)
    wp = _round_up(spec.w, _TW)
    nr, nc = hp // TH, wp // _TW

    # edge-padded source (finite values for weight-zero / masked reads)
    src = jnp.pad(
        img,
        (
            (spec.pry, spec.hp_src - spec.sh - spec.pry),
            (spec.prx, spec.wp_src - spec.sw - spec.prx),
        ),
        mode="edge",
    )

    kern = functools.partial(
        _remap_kernel,
        TH=TH,
        NOY=spec.noy,
        NOX=spec.nox,
        SR=spec.sr,
        BH=spec.bh,
        PRY=spec.pry,
        PRX=spec.prx,
        nc=nc,
    )
    row_spec = pl.BlockSpec((TH, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            row_spec,
            row_spec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((spec.bh, spec.wp_src), jnp.float32),
            pltpu.VMEM((spec.noy + 1, TH, _TW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(plan.base_y, plan.base_x, plan.band_y0, src, plan.ymap, plan.xmap)

    out = out[: spec.h, : spec.w]
    return jnp.where(plan.inb, out, jnp.float32(fill))
