"""In-context SGM stage attribution: time cumulative prefixes of the pipeline
so each stage's cost is a difference of two end-to-end measurements (the
isolated-stage numbers are inflated by alias copies)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_pair  # noqa: E402
from stepth_tpu.config import MatchConfig
from stepth_tpu.match import dense, pallas_sgm
from stepth_tpu.match.sgm import SGMConfig

H, W = 1080, 1920
cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(name, fn, *args, n2=12):
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
    ms = sorted(est)[1] * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    cfg = MatchConfig(num_disparities=64, window=5, cost="sad", lr_threshold=1.0)
    sc = SGMConfig(directions=4, step_block=16, lane_tile=512)
    left_np, right_np = make_pair(H, W)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)

    def prefix(stages):
        def fn(l, r):
            lg = dense.grayscale(l)
            rg = dense.grayscale(r)
            vol, (h, w, hp, wp) = pallas_sgm._aggregated_volume(
                lg, rg, cfg, 16, False
            )
            scale = float(cfg.window * cfg.window)
            p1, p2 = sc.p1 * scale, sc.p2 * scale
            kw = dict(p1=p1, p2=p2, interpret=False,
                      step_block=sc.step_block, lane_tile=sc.lane_tile)
            out = vol
            if stages >= 1:
                volT = jnp.swapaxes(vol, 1, 2)
                out = volT
            if stages >= 2:
                acc = pallas_sgm._scan_direction(
                    volT, None, S_real=w, T_real=h, reverse=False, **kw)
                out = acc
            if stages >= 3:
                acc = pallas_sgm._scan_direction(
                    volT, acc, S_real=w, T_real=h, reverse=True, **kw)
                out = acc
            if stages >= 4:
                out = jnp.swapaxes(acc, 1, 2)
            if stages >= 5:
                out = pallas_sgm._scan_direction(
                    vol, out, S_real=h, T_real=w, reverse=False, **kw)
            if stages >= 6:
                out = pallas_sgm._scan_direction(
                    vol, out, S_real=h, T_real=w, reverse=True, **kw)
            if stages >= 7:
                disp, _, cbest, valid_f = pallas_sgm._wta_from_volume(
                    out, Wr=w, cfg=cfg, tile_rows=16)
                out = disp
            return out

        return fn

    names = ["volume", "+transpose", "+scan_h_fwd", "+scan_h_rev",
             "+transpose_back", "+scan_v_fwd", "+scan_v_rev", "+wta"]
    prev = 0.0
    for i, name in enumerate(names):
        ms = timeit(f"prefix {name}", prefix(i), left, right)
        print(f"   -> delta {name}: {ms - prev:.3f} ms", flush=True)
        prev = ms

    timeit("FULL match_pair_sgm_pallas",
           lambda l, r: pallas_sgm.match_pair_sgm_pallas(l, r, cfg, sc).disparity,
           left, right)


if __name__ == "__main__":
    main()
