"""Isolated scan-kernel micro-bench on the chip (layout experiments)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from stepth_tpu.match import pallas_sgm  # noqa: E402

D, S, T = 64, 2048, 1152


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
        t0 = time.perf_counter(); _ = float(jnp.ravel(f1(args[0]))[0])
        t1 = time.perf_counter(); _ = float(jnp.ravel(f2(args[0]))[0])
        t2 = time.perf_counter(); est.append(((t2 - t1) - (t1 - t0)) / (n2 - 2))
    print(f"{name}: {sorted(est)[1]*1e3:.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.integers(0, 6000, size=(D, S, T)).astype(np.float32))
    for bs, lt in ((8, 512), (16, 512), (16, 1024), (8, 1024), (32, 512), (16, 128)):
        timeit(
            f"first fwd BS={bs} TT={lt}",
            lambda v, b=bs, l=lt: pallas_sgm._scan_direction(
                v, None, S_real=S - 100, T_real=T - 72, p1=200.0, p2=800.0,
                reverse=False, step_block=b, lane_tile=l,
            ),
            vol,
        )
    timeit(
        "first rev BS=16 TT=512",
        lambda v: pallas_sgm._scan_direction(
            v, None, S_real=S - 100, T_real=T - 72, p1=200.0, p2=800.0,
            reverse=True, step_block=16, lane_tile=512,
        ),
        vol,
    )
    # transpose costs, lane-swap vs outer-swap
    volD = jnp.asarray(rng.integers(0, 6000, size=(D, S, T)).astype(np.float32))
    timeit("outer-swap (1,0,2)", lambda v: jnp.transpose(v, (1, 0, 2)) + 0.0, volD)
    timeit("lane-swap (2,0,1)", lambda v: jnp.transpose(v, (2, 0, 1)) + 0.0, volD)
    timeit("lane-swap (2,1,0)", lambda v: jnp.transpose(v, (2, 1, 0)) + 0.0, volD)
    timeit("minor-swap (0,2,1)", lambda v: jnp.transpose(v, (0, 2, 1)) + 0.0, volD)


if __name__ == "__main__":
    main()
