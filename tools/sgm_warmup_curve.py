"""EPE-vs-warmup curve for the windowed (approximate) sharded Pallas SGM.

VERDICT r4 next #4: the fully-parallel windowed mode trades seam exactness
for scan parallelism; this tool prices that trade at production scale. Multi-
chip hardware is not available, so the warm-mode shard math is EMULATED on
the single chip with the very kernels the sharded path runs: per shard, the
halo rows come from the full image (exactly what the ppermute exchange would
deliver), the volume builder gets the same global row window, the local
aggregation runs over the warm-up-extended rows, and the stitched filled
disparities get one full median (identical to the sharded per-shard median
with halo, since both are local 3×3 on the same stitched field). The only
thing not measured is wall-time — the arithmetic is the deployment
arithmetic.

    python tools/sgm_warmup_curve.py [--shards 4,8] [--warmups 8,16,32,64]

Prints a markdown table: per (n_shards, warmup), deviation from the
unsharded backend (mean/max |Δd|, % flipped > 1 px) and absolute accuracy
vs ground truth (EPE / bad3 on the box scene) next to the unsharded row.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, DMAX = 1088, 1920, 64


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", default="4,8")
    ap.add_argument("--warmups", default="8,16,32,64")
    ap.add_argument("--directions", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig
    from stepth_tpu.match import dense, pallas_post, pallas_sgm
    from stepth_tpu.match import sgm as sgm_mod
    from stepth_tpu.parallel.sharded import required_halo
    from stepth_tpu.utils import scenes

    interpret = jax.default_backend() != "tpu"
    cfg = MatchConfig(num_disparities=DMAX, window=5, cost="sad",
                      lr_threshold=1.0)
    sc_cfg = sgm_mod.SGMConfig(directions=args.directions)
    scale = float(cfg.window * cfg.window)
    p1s, p2s = sc_cfg.p1 * scale, sc_cfg.p2 * scale
    halo = required_halo(cfg)

    scene = scenes.make_scene("box", H, W, DMAX, seed=1)
    left = jnp.asarray(scene.left)
    right = jnp.asarray(scene.right)
    lg = dense.grayscale(left)
    rg = dense.grayscale(right)

    print(f"platform={jax.default_backend()} 1080p D={DMAX} "
          f"{args.directions}-dir window={cfg.window}", file=sys.stderr)

    ref = pallas_sgm.match_pair_sgm_pallas(
        left, right, cfg, sc_cfg, interpret=interpret
    )
    d_ref = np.asarray(ref.disparity)
    st_ref = scenes.evaluate_disparity(
        scene, d_ref, np.asarray(ref.valid)
    )

    def _round_up(x, m):
        return (x + m - 1) // m * m

    def run_windowed(nsh: int, wu: int):
        th = H // nsh
        ext = halo + wu
        rows = th + 2 * wu
        disp_parts, valid_parts = [], []
        for i in range(nsh):
            r0 = i * th
            lo, hi = r0 - ext, r0 + th + ext
            # edge-replicate beyond the true borders, like _with_halo
            idx = np.clip(np.arange(lo, hi), 0, H - 1)
            l_ext = lg[jnp.asarray(idx)]
            r_ext = rg[jnp.asarray(idx)]
            vol_p, _ = pallas_sgm._aggregated_volume(
                l_ext, r_ext, cfg, 16, interpret,
                g_row0=lo, g_h=H,
            )
            vol = vol_p[:, halo : halo + rows]
            gidx = jnp.arange(rows) + (r0 - wu)
            in_img = (gidx >= 0) & (gidx < H)
            vol = vol * in_img[None, :, None].astype(vol.dtype)
            rp = _round_up(rows, 128)
            volp = jnp.pad(vol, ((0, 0), (0, rp - rows), (0, 0)))
            agg = pallas_sgm.aggregate_pallas(
                volp, sc_cfg, p1s, p2s, S_dims=(rows, W), interpret=interpret
            )
            agg = agg[:, wu : wu + th]
            dp, dr, cb, vp = pallas_sgm._wta_from_volume(
                agg, Wr=W, cfg=cfg, tile_rows=16 if th % 16 == 0 else 8,
                interpret=interpret,
            )
            disp = dp[:th, :W]
            valid = vp[:th, :W] > 0.5
            disp = pallas_post.fill_invalid_pallas(
                disp, valid, interpret=interpret
            )
            disp_parts.append(np.asarray(disp))
            valid_parts.append(np.asarray(valid))
        stitched = jnp.asarray(np.concatenate(disp_parts, axis=0))
        final = pallas_post.median3_pallas(stitched, interpret=interpret)
        return np.asarray(final), np.concatenate(valid_parts, axis=0)

    print("| n_shards | warmup | mean|Δd| px | max|Δd| px | flipped>1px | "
          "EPE | bad3 | seam-band EPE |")
    print("|---|---|---|---|---|---|---|---|")
    print(f"| 1 (unsharded) | — | 0 | 0 | 0 | {st_ref['epe']:.3f} | "
          f"{st_ref['bad3']:.4f} | — |")
    for nsh in [int(x) for x in args.shards.split(",")]:
        for wu in [int(x) for x in args.warmups.split(",")]:
            d_w, v_w = run_windowed(nsh, _round_up(wu, 8))
            dd = np.abs(d_w - d_ref)
            st = scenes.evaluate_disparity(scene, d_w, v_w)
            # seam band: ±16 rows around each interior seam
            band = np.zeros(H, bool)
            for i in range(1, nsh):
                band[max(0, i * (H // nsh) - 16) : i * (H // nsh) + 16] = True
            g = scene.disparity
            nocc = ~scene.occluded
            seam_epe = float(
                np.abs(d_w - g)[band][nocc[band]].mean()
            )
            print(
                f"| {nsh} | {wu} | {dd.mean():.4f} | {dd.max():.2f} | "
                f"{(dd > 1).mean():.4f} | {st['epe']:.3f} | "
                f"{st['bad3']:.4f} | {seam_epe:.3f} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
