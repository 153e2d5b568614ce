"""Row-tile-sharded ALL-PALLAS semi-global matching (VERDICT r4 next #4).

The round-4 comm table's SGM scaling rows projected the *XLA* sharded SGM —
a backend ~7× slower than the Pallas SGM anyone would deploy. This module
shards the production kernels themselves, reusing the XLA relay's structure
(:mod:`stepth_tpu.parallel.sgm_sharded` — the blueprint) with the Pallas
scan kernels as the compute:

* ``exact=True`` — the vertical/diagonal scan carries ``[D, W]`` relay
  shard-to-shard over ICI (``lax.ppermute``) between *Pallas* scan calls:
  :func:`stepth_tpu.match.pallas_sgm.scan_direction_carry` seeds each local
  scan with the upstream shard's final carry and emits its own, which is
  bit-identical to the continuous unsharded scan on those rows (unit-tested
  per direction). The chain is serial like every exact SGM relay; sharding
  buys distributed volume memory and n-way-parallel volume build, horizontal
  scans, WTA, and epilogue.
* ``exact=False`` — fully parallel windowed mode: ``warmup`` extra halo rows
  warm the directional carries (the SGM recurrence forgets its init at
  ``min + P2`` speed). True-border scan INITS are exact (out-of-image rows
  carry zero cost, so no spurious warm-up from replicated rows), though
  border *output* rows still see the opposite direction's seam-warmed carry;
  the approximation decays with distance from each seam. The accuracy price
  at 1080p is measured by ``tools/sgm_warmup_curve.py`` and recorded in
  BASELINE.md.

Direction order matches :func:`stepth_tpu.parallel.sgm_sharded._aggregate_sharded`
(horizontals, diagonals ↘ ↙ ↗ ↖, verticals) — for 4 directions this is also
the unsharded Pallas order, so exact mode is seam-bit-clean against it; for
8 directions the unsharded backend may scan diagonals on the transposed
orientation (whichever lateral extent is smaller), so agreement is to f32
reassociation tolerance, the sharded-SGM standard.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stepth_tpu.config import MatchConfig
from stepth_tpu.match import dense, pallas_post, pallas_sgm
from stepth_tpu.match import sgm as sgm_mod
from stepth_tpu.parallel.sharded import _with_halo, required_halo


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _relay_dir_pallas(vol, acc, *, reverse: bool, shift: int, p1, p2,
                      axis_name: str, interpret: bool, step_block: int,
                      lane_tile):
    """One relayed direction over the local volume ``vol`` [D, th, wp],
    accumulating onto ``acc`` in-kernel (same f32 sum order as unsharded).
    Round *s*: the owner shard scans seeded by the relayed carry; non-owners
    compute on a garbage seed and are masked out (the chain is serial — idle
    shards would idle anyway)."""
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    perm = up if reverse else down
    D, th, wp = vol.shape
    carry = jnp.zeros((D, wp), jnp.float32)
    kw = dict(
        S_real=th, T_real=wp, p1=p1, p2=p2, reverse=reverse, shift=shift,
        interpret=interpret, step_block=step_block, lane_tile=lane_tile,
    )
    for s in range(n):
        owner = (n - 1 - s) if reverse else s
        out_s, fc = pallas_sgm.scan_direction_carry(vol, acc, carry, **kw)
        mine = idx == owner
        acc = jnp.where(mine, out_s, acc)
        if s < n - 1:
            carry = lax.ppermute(jnp.where(mine, fc, 0.0), axis_name, perm)
    return acc


def _exact_agg(vol, *, sgm, p1s, p2s, w_real, axis_name, interpret):
    """Direction sum for exact mode: horizontals local, the rest relayed."""
    D, th, wp = vol.shape
    kw = dict(p1=p1s, p2=p2s, interpret=interpret,
              step_block=sgm.step_block, lane_tile=sgm.lane_tile)
    rkw = dict(p1=p1s, p2=p2s, axis_name=axis_name, interpret=interpret,
               step_block=sgm.step_block, lane_tile=sgm.lane_tile)
    thp = _round_up(th, 128)
    volT = jnp.swapaxes(vol, 1, 2)  # [D, wp, th]
    volT = jnp.pad(volT, ((0, 0), (0, 0), (0, thp - th)))
    acc = pallas_sgm._scan_direction(
        volT, None, S_real=w_real, T_real=th, reverse=False, **kw
    )
    acc = pallas_sgm._scan_direction(
        volT, acc, S_real=w_real, T_real=th, reverse=True, **kw
    )
    acc = jnp.swapaxes(acc, 1, 2)[:, :th, :]  # [D, th, wp]
    if sgm.directions == 8:
        for rev, sh in ((False, 1), (False, -1), (True, 1), (True, -1)):
            acc = _relay_dir_pallas(vol, acc, reverse=rev, shift=sh, **rkw)
    if sgm.directions >= 4:
        # directions=2 is horizontals-only (row-local, no relay at all)
        acc = _relay_dir_pallas(vol, acc, reverse=False, shift=0, **rkw)
        acc = _relay_dir_pallas(vol, acc, reverse=True, shift=0, **rkw)
    return acc


def _wta_epilogue(agg, th, w_real, cfg, axis_name, interpret):
    """Row-local WTA / uniqueness / LR / fill / median on the aggregated
    volume [D, th, wp] (the same Pallas epilogue kernels as unsharded)."""
    TH = 16 if th % 16 == 0 else 8
    disp_p, dispr_p, cbest_p, valid_p = pallas_sgm._wta_from_volume(
        agg, Wr=w_real, cfg=cfg, tile_rows=TH, interpret=interpret
    )
    disp = disp_p[:th, :w_real]
    cbest = cbest_p[:th, :w_real]
    valid = valid_p[:th, :w_real] > 0.5
    disp = pallas_post.fill_invalid_pallas(disp, valid, interpret=interpret)
    d_ext = _with_halo(disp, 8, axis_name, edge="replicate")
    disp = pallas_post.median3_pallas(d_ext, interpret=interpret)[8 : 8 + th]
    return disp, valid, cbest


@partial(
    jax.jit, static_argnames=("cfg", "sgm", "mesh", "exact", "warmup", "halo")
)
def match_pair_sgm_pallas_sharded(
    left,
    right,
    cfg: MatchConfig = MatchConfig(),
    sgm: sgm_mod.SGMConfig = sgm_mod.SGMConfig(),
    mesh: Optional[Mesh] = None,
    exact: bool = True,
    warmup: int = 32,
    halo: Optional[int] = None,
) -> dense.MatchResult:
    """Row-tile-sharded twin of
    :func:`stepth_tpu.match.pallas_sgm.match_pair_sgm_pallas` over ``mesh``'s
    ``tile`` axis. See the module docstring for the two modes."""
    if mesh is None:
        from stepth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if halo is None:
        halo = required_halo(cfg)
    if cfg.cost not in ("sad", "ssd", "census"):
        raise NotImplementedError(f"pallas sgm: cost {cfg.cost!r} unsupported")
    if sgm.directions not in (2, 4, 8):
        raise ValueError(f"directions must be 2, 4 or 8, got {sgm.directions}")
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    h, w = left.shape[:2]
    ntile = mesh.shape["tile"]
    if h % ntile != 0:
        raise ValueError(f"H={h} not divisible by tile axis {ntile}")
    th = h // ntile
    if th % 8 != 0:
        raise ValueError(f"tile height {th} must be a multiple of 8")
    wu = 0 if exact else _round_up(int(warmup), 8)
    if th < halo + wu:
        raise ValueError(f"tile height {th} < halo+warmup {halo + wu}")

    spec = P("tile", None) if left.ndim == 2 else P("tile", None, None)
    fn = shard_map(
        partial(
            _tile_entry, cfg=cfg, sgm=sgm, halo=halo, wu=wu, h_total=h,
            w_real=w, exact=exact, axis_name="tile",
            interpret=jax.default_backend() != "tpu",
        ),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(P("tile", None), P("tile", None), P("tile", None)),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    disp, valid, cbest = fn(left, right)
    return dense.MatchResult(disparity=disp, valid=valid, cost=cbest)


def _tile_entry(l_blk, r_blk, *, cfg, sgm, halo, wu, h_total, w_real, exact,
                axis_name, interpret):
    th = l_blk.shape[0]
    idx = lax.axis_index(axis_name)
    row0 = idx * th
    ext = halo + wu

    l_ext = _with_halo(l_blk, ext, axis_name, edge="replicate")
    r_ext = _with_halo(r_blk, ext, axis_name, edge="replicate")
    lg = dense.grayscale(l_ext)
    rg = dense.grayscale(r_ext)
    vdtype = jnp.bfloat16 if sgm.volume_dtype == "bf16" else jnp.float32
    vol_p, _dims = pallas_sgm._aggregated_volume(
        lg, rg, cfg, 16, interpret, dtype=vdtype,
        g_row0=row0 - ext, g_h=h_total,
    )
    rows = th + 2 * wu
    vol = vol_p[:, halo : halo + rows]  # [D, rows, wp]

    if wu:
        # the builder's global mask already zeroes out-of-image rows' box
        # sums; re-zero the sliced rows too so warm-up scans cross true
        # borders with an identically-zero carry
        gidx = row0 - wu + jnp.arange(rows)
        in_img = (gidx >= 0) & (gidx < h_total)
        vol = vol * in_img[None, :, None].astype(vol.dtype)

    scale = float(cfg.window * cfg.window) if cfg.window > 1 else 1.0
    p1s, p2s = sgm.p1 * scale, sgm.p2 * scale

    if exact:
        # exact mode scans in f32 regardless of volume_dtype: the relayed
        # carries are f32, and a bf16 accumulator would diverge from the
        # f32 relay chain (the unsharded bf16 contract is bf16-close, not
        # bit-exact, so this costs nothing semantically — only the volume
        # memory saving is given back in exact mode; windowed mode keeps it)
        agg = _exact_agg(
            vol.astype(jnp.float32), sgm=sgm, p1s=p1s, p2s=p2s,
            w_real=w_real, axis_name=axis_name, interpret=interpret,
        )
    else:
        rp = _round_up(rows, 128)
        volp = jnp.pad(vol, ((0, 0), (0, rp - rows), (0, 0)))
        agg = pallas_sgm.aggregate_pallas(
            volp, sgm, p1s, p2s, S_dims=(rows, w_real), interpret=interpret
        )
        agg = agg[:, wu : wu + th]

    return _wta_epilogue(agg, th, w_real, cfg, axis_name, interpret)
