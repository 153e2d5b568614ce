"""Speed/accuracy frontier for the multi-window refine knobs (round-3/4).

Sweeps ``refine_windows`` × ``tile_rows`` for the 1080p flagship and reports,
per config:

* ms/frame on the smooth constant-shift bench texture (every tile takes the
  single-window fast path — the headline's best case),
* ms/frame on the box scene (layered occlusion, disparity steps ≈ 0.3·dmax —
  exercises the adaptive multi-window machinery),
* bad3 / edge_bad3 / EPE on the box and ellipses ground-truth scenes.

The PyramidConfig.refine_windows default must cite this table (VERDICT r3
item 3). Timing uses the same traced-trip-count two-point device-loop as
bench.py; run on the TPU:

    python tools/refine_frontier.py [--windows 1,2,4,6] [--tile-rows 32,64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 1088, 1920
DMAX = 128


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", default="1,2,4,6")
    ap.add_argument("--tile-rows", default="32,64")
    ap.add_argument(
        "--final", default=None,
        help="comma-separated R:NW pairs for the final level, e.g. "
        "'4:6,3:8,2:10' — sweeps refine_radius_final/refine_windows_final "
        "instead of the nw sweep (uses the first --windows value as the "
        "coarse-level nw)")
    ap.add_argument("--radius", type=int, default=4,
                    help="refine_radius for the non-final levels")
    ap.add_argument("--reps", type=int, default=3)
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

    from bench import make_pair
    from stepth_tpu.config import MatchConfig, PyramidConfig
    from stepth_tpu.match import pallas_refine
    from stepth_tpu.utils import scenes

    cfg = MatchConfig(num_disparities=DMAX, window=9, cost="sad")

    smooth_l, smooth_r = make_pair(H, W)
    box = scenes.make_scene("box", H, W, DMAX, seed=1)
    ell = scenes.make_scene("ellipses", H, W, DMAX, seed=1)
    pairs = {
        "smooth": (jnp.asarray(smooth_l), jnp.asarray(smooth_r)),
        "box": (jnp.asarray(box.left), jnp.asarray(box.right)),
        "ellipses": (jnp.asarray(ell.left), jnp.asarray(ell.right)),
    }

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rows = []
    if args.final:
        combos = []
        nw0 = int(args.windows.split(",")[0])
        for pair in args.final.split(","):
            rf, nwf = (int(x) for x in pair.split(":"))
            combos.append((nw0, rf, nwf))
    else:
        combos = [(int(x), None, None) for x in args.windows.split(",")]
    for tr in [int(x) for x in args.tile_rows.split(",")]:
        for nw, rfin, nwfin in combos:
            pyr = PyramidConfig(
                levels=4, refine_radius=args.radius, coarsest_disparities=16,
                refine_windows=nw,
                refine_radius_final=rfin, refine_windows_final=nwfin,
            )

            @jax.jit
            def run_n(l0, r, n, pyr=pyr, tr=tr):
                def body(_, carry):
                    l, _d = carry
                    d = pallas_refine.match_hierarchical_pallas(
                        l, r, cfg, pyr, tile_rows=tr
                    ).disparity
                    return (l0 + d[:1, :1] * 1e-6, d)

                return jax.lax.fori_loop(
                    0, n, body, (l0, jnp.zeros(l0.shape, jnp.float32))
                )[1]

            def throughput(l, r, reps):
                est = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    _ = float(jnp.sum(run_n(l, r, 5)[:1, :8]))
                    t1 = time.perf_counter()
                    _ = float(jnp.sum(run_n(l, r, 55)[:1, :8]))
                    t2 = time.perf_counter()
                    est.append(((t2 - t1) - (t1 - t0)) / 50)
                return sorted(est)[len(est) // 2] * 1e3  # ms

            t0 = time.perf_counter()
            _ = float(jnp.sum(run_n(*pairs["smooth"], 1)[:1, :8]))
            print(
                f"[frontier] nw={nw} tr={tr} compile+first "
                f"{time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
            )
            row = {"nw": nw, "tr": tr}
            if rfin is not None:
                row["final"] = f"R{rfin}xW{nwfin}"
            if args.radius != 4:
                row["final"] = row.get("final", "") + f"(allR{args.radius})"
            for name in ("smooth", "box"):
                throughput(*pairs[name], reps=1)  # warm both trip counts
                row[f"{name}_ms"] = throughput(*pairs[name], reps=args.reps)
            for name, sc in (("box", box), ("ellipses", ell)):
                d = np.asarray(run_n(*pairs[name], 1))
                ev = scenes.evaluate_disparity(sc, d)
                row[f"{name}_bad3"] = ev["bad3"]
                row[f"{name}_edge_bad3"] = ev["edge_bad3"]
                row[f"{name}_epe"] = ev["epe"]
            rows.append(row)
            print(f"[frontier] {row}", file=sys.stderr)

    print("| nw | final | tile_rows | smooth ms | box ms | box bad3 |"
          " box edge_bad3 |"
          " box EPE | ell bad3 | ell edge_bad3 | ell EPE |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['nw']} | {r.get('final', '-')} | {r['tr']} |"
            f" {r['smooth_ms']:.3f} | "
            f"{r['box_ms']:.3f} | {r['box_bad3']*100:.2f}% | "
            f"{r['box_edge_bad3']*100:.2f}% | {r['box_epe']:.3f} | "
            f"{r['ellipses_bad3']*100:.2f}% | "
            f"{r['ellipses_edge_bad3']*100:.2f}% | {r['ellipses_epe']:.3f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
