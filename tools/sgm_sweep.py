"""On-chip sweep of the SGM scan-kernel shape knobs (VERDICT round-2 #3).

Measures the FULL Pallas SGM pipeline at 1080p/D=64/4-dir for a grid of
(step_block, lane_tile-cap) values — the stages-in-isolation numbers proved
misleading (input/output aliasing copies inflate them), so only the
end-to-end device-throughput number decides the defaults.

Usage: python tools/sgm_sweep.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_pair  # noqa: E402
from stepth_tpu.config import MatchConfig
from stepth_tpu.match import pallas_sgm
from stepth_tpu.match.sgm import SGMConfig

H, W = 1080, 1920

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, *args, n2=12):
    def looped(n):
        def body(_, x):
            out = fn(x, *args[1:])
            return x + jnp.ravel(out)[0].astype(x.dtype) * 1e-30

        return jax.jit(lambda a: jax.lax.fori_loop(0, n, body, a))

    f1, f2 = looped(2), looped(n2)
    for f in (f1, f2):
        _ = float(jnp.ravel(f(args[0]))[0])
    est = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.ravel(f1(args[0]))[0])
        t1 = time.perf_counter()
        _ = float(jnp.ravel(f2(args[0]))[0])
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / (n2 - 2))
    return sorted(est)[1] * 1e3


def main():
    quick = "--quick" in sys.argv
    cfg = MatchConfig(num_disparities=64, window=5, cost="sad", lr_threshold=1.0)
    left_np, right_np = make_pair(H, W)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)

    combos = []
    for bs in (8, 16, 32):
        for lt in (128, 256, 384, 512, 1024):
            # VMEM guard: ~3 live buffers x 2 (double buffer) x D*BS*TT*4B
            if 6 * 64 * bs * lt * 4 > 14 * 1024 * 1024:
                continue
            combos.append((bs, lt))
    if quick:
        combos = [(8, 512), (16, 512), (8, 1024), (16, 384), (32, 256)]

    results = []
    for bs, lt in combos:
        sc = SGMConfig(directions=4, step_block=bs, lane_tile=lt)
        try:
            ms = timeit(
                lambda l, r, s=sc: pallas_sgm.match_pair_sgm_pallas(
                    l, r, cfg, s
                ).disparity,
                left,
                right,
            )
        except Exception as e:  # VMEM OOM etc.
            print(f"step_block={bs:3d} lane_tile={lt:5d}: FAILED {type(e).__name__}",
                  flush=True)
            continue
        results.append((ms, bs, lt))
        print(f"step_block={bs:3d} lane_tile={lt:5d}: {ms:7.3f} ms", flush=True)

    results.sort()
    print("\nbest:")
    for ms, bs, lt in results[:5]:
        print(f"  {ms:7.3f} ms  step_block={bs} lane_tile={lt}")


if __name__ == "__main__":
    main()
