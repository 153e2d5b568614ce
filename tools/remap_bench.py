"""On-chip timing of the Pallas remap kernel vs the XLA gather path (1080p)."""
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

from stepth_tpu.ops import rectify  # noqa: E402
from stepth_tpu.ops.pallas_remap import plan_remap, remap_bilinear_pallas  # noqa: E402


def timeit(name, fn, img, n2=12):
    def looped(n):
        return jax.jit(
            lambda im: jax.lax.fori_loop(
                0, n,
                lambda _, acc: acc + jnp.ravel(fn(im + acc * 1e-30))[0] * 1e-30,
                jnp.float32(0),
            )
        )

    f1, f2 = looped(2), looped(n2)
    for f in (f1, f2):
        _ = float(f(img))
    est = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(f1(img))
        t1 = time.perf_counter(); _ = float(f2(img))
        t2 = time.perf_counter(); est.append(((t2 - t1) - (t1 - t0)) / (n2 - 2))
    ms = sorted(est)[1] * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    h, w = 1080, 1920
    K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]], np.float32)
    ang = 0.03
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    T = np.array([-0.5, 0.01, 0.005], np.float32)
    maps = rectify.rectify_maps(K, K, R, T, (h, w), dist1=(0.05, -0.01, 0.001, 0.0))
    for tr in (8, 16, 32):
        spec, plan = plan_remap(np.asarray(maps.map_left), (h, w), tile_rows=tr)
        print(f"tile_rows={tr}: noy={spec.noy} nox={spec.nox} bh={spec.bh}",
              flush=True)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (h, w)).astype(np.float32))
        timeit(f"pallas remap 1080p tr={tr}",
               lambda im, s=spec, p=plan: remap_bilinear_pallas(im, s, p), img)
    mj = jnp.asarray(maps.map_left)
    timeit("xla map_coordinates remap 1080p",
           lambda im: rectify.remap_bilinear(im, mj), img)


if __name__ == "__main__":
    main()
