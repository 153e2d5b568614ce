"""Multi-chip / multi-host scaling projections for BASELINE.md configs 3-5.

Prints the roofline table: per-frame collective budgets (validated op-for-op
against compiled HLO in tests/test_comm_model.py) + measured single-chip
compute times → projected efficiency at 1-4 hosts × 8 chips (v5e pod slice
assumptions stated in stepth_tpu/parallel/comm_model.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stepth_tpu.config import MatchConfig, PyramidConfig
from stepth_tpu.parallel import comm_model as cm

# measured single-chip device-throughput frame times (tpu_measure.log / BASELINE.md)
FLAGSHIP_MS = 1.30  # 1080p hierarchical-pallas eff-D=128, R=2/nw=12/16 defaults (round 5)
SGM_MS = 15.3  # 1080p Pallas SGM D=64 4-dir, fused-WTA final scan (round 4)
BA_MS_PER_LM = 309.0  # 128 cams / 65 536 pts / 1 048 576 obs, ms per LM iter


def show(build, compute_ms, configs):
    """``build`` is a callable n → CommReport: the report is rebuilt for every
    grid point so (n−1)-proportional relay counts and n-dependent halo/tile
    sizing are exact at each n (comm_model.project would otherwise rescale
    relays from the build-time n but keep halos baked)."""
    rep8 = build(8)
    print(f"\n=== {rep8.name} (single-chip {compute_ms} ms/frame) ===")
    print(rep8.table())
    print(f"{'devices':>8} {'hosts':>6} {'compute':>9} {'comm':>8} {'eff':>6}")
    for n, hosts in configs:
        p = cm.project(build(n), compute_ms, n, hosts)
        print(f"{n:8d} {hosts:6d} {p.compute_ms:8.3f}ms {p.comm_ms:7.3f}ms "
              f"{p.efficiency*100:5.1f}%")


def main():
    grid = [(2, 1), (4, 1), (8, 1), (16, 2), (32, 4)]

    cfg = MatchConfig(num_disparities=128, window=9, cost="sad")
    pyr = PyramidConfig(levels=4, coarsest_disparities=16)
    show(lambda n: cm.comm_hierarchical_sharded(cfg, pyr, 1080, 1920, n),
         FLAGSHIP_MS, grid)
    show(lambda n: cm.comm_hierarchical_sharded(cfg, pyr, 1080, 1920, n,
                                                coarse_backend="sgm"),
         1.50, grid)

    scfg = MatchConfig(num_disparities=64, window=5, cost="sad", lr_threshold=1.0)
    show(lambda n: cm.comm_sgm_sharded(scfg, 1080, 1920, n, directions=4,
                                       exact=True),
         SGM_MS, grid)
    show(lambda n: cm.comm_sgm_sharded(scfg, 1080, 1920, n, directions=4,
                                       exact=False),
         SGM_MS, grid)

    # BA: one solve call = 10 LM iters (all-reduce only — n-independent report)
    show(lambda n: cm.comm_ba_sharded(128, 65536, lm_iters=10, cg_iters=10),
         10 * BA_MS_PER_LM, grid)


if __name__ == "__main__":
    main()
