"""Benchmark harness. Prints ONE JSON line:

    {"metric": "stereo frames/s/chip at 1080p", "value": N,
     "unit": "frames/s", "vs_baseline": R}

``value`` is the hierarchical dense matcher's steady-state frames/s on one
chip at 1080p (config 3 of BASELINE.md). ``vs_baseline`` is the speedup over
the **multithreaded C++ implementation of the same hierarchical pipeline**
(stepth_tpu/native engine, 8 threads — the honest stand-in for the reference's
compiled Rust + 8-way rayon, reference src/depth_image.rs:111-123; no Rust
toolchain in this environment). The single-threaded NumPy twin is also
measured and reported on stderr for continuity with round 1.

Extra configs (VGA dense, bundled-asset parity path) are reported on stderr so
stdout stays a single JSON line for the driver.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H, W = 1088, 1920  # 1080p rounded to /32 for clean pyramid levels


def make_pair(h, w, shift=24, seed=0):
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 255, size=(h, w + shift)).astype(np.float32)
    k = np.ones(9, np.float32) / 9
    tex = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 1, tex)
    tex = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 0, tex)
    return tex[:, :w], tex[:, shift : shift + w]


# ----------------------------------------------------------------------------
# NumPy CPU twin of the hierarchical matcher (baseline stand-in)
# ----------------------------------------------------------------------------

def _np_boxsum(x, window):
    if window <= 1:
        return x
    r = window // 2
    out = x.astype(np.float32)
    for axis in (0, 1):
        n = out.shape[axis]
        ii = np.cumsum(out, axis=axis)
        pad = [(0, 0)] * out.ndim
        pad[axis] = (1, 0)
        ii = np.pad(ii, pad)
        idx = np.arange(n)
        hi = np.minimum(idx + r + 1, n)
        lo = np.maximum(idx - r, 0)
        out = np.take(ii, hi, axis=axis) - np.take(ii, lo, axis=axis)
    return out


def _np_dense(left, right, num_disp, window):
    h, w = left.shape
    vol = np.empty((h, w, num_disp), np.float32)
    padded = np.pad(right, ((0, 0), (num_disp - 1, 0)), mode="edge")
    for d in range(num_disp):
        rs = padded[:, num_disp - 1 - d : num_disp - 1 - d + w]
        vol[:, :, d] = np.abs(left - rs)
    agg = _np_boxsum(vol, window)
    return np.argmin(agg, axis=-1).astype(np.float32)


def _np_refine(left, right, prior, radius, window):
    h, w = left.shape
    base = np.round(prior).astype(np.int64)
    offs = np.arange(-radius, radius + 1)
    x = np.arange(w)[None, :]
    xs = x[..., None] - (base[..., None] + offs[None, None, :])
    inb = (xs >= 0) & (xs < w)
    xs = np.clip(xs, 0, w - 1)
    samp = right[np.arange(h)[:, None, None], xs]  # gather (h, w, 2r+1)
    cost = np.abs(left[..., None] - samp)
    cost[~inb] = 1e6
    agg = _np_boxsum(cost, window)
    best = np.argmin(agg, axis=-1)
    return np.clip(base + (best - radius), 0, w - 1).astype(np.float32)


def numpy_hierarchical(left, right, levels=4, coarsest_disp=16, radius=4, window=9):
    lefts, rights = [left], [right]
    for _ in range(levels - 1):
        l, r = lefts[-1], rights[-1]
        h2, w2 = l.shape[0] // 2, l.shape[1] // 2
        lefts.append(l[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3)))
        rights.append(r[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3)))
    disp = _np_dense(lefts[-1], rights[-1], coarsest_disp, window)
    for lvl in range(levels - 2, -1, -1):
        h, w = lefts[lvl].shape
        prior = np.repeat(np.repeat(disp, 2, 0), 2, 1)[:h, :w] * 2.0
        disp = _np_refine(lefts[lvl], rights[lvl], prior, radius, window)
    return disp


# ----------------------------------------------------------------------------


_CPU_CACHE = "BENCH_CPU_BASELINE.json"


def cpu_baseline_fps(left_np, right_np):
    """CPU baselines on the same hierarchical pipeline. Returns
    ``(native_fps, numpy_fps)``:

    * ``native_fps`` — the honest baseline: multithreaded C++ (8 threads,
      sliding-window box sums; stepth_tpu/native.hier_disparity), standing in
      for the reference's compiled Rust + rayon. Measured fresh each run
      (fast), median of 3.
    * ``numpy_fps`` — single-threaded NumPy twin (round-1 continuity). Cached
      after first measurement: the host CPU is heavily throttled and one run
      takes ~100 s.
    """
    import os

    try:
        from stepth_tpu import native

        native.hier_disparity(left_np, right_np)  # warm (build + cache)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            native.hier_disparity(left_np, right_np)
            times.append(time.perf_counter() - t0)
        native_fps = 1.0 / sorted(times)[1]
    except Exception as e:  # no toolchain
        print(f"[bench] native C++ baseline unavailable: {e}", file=sys.stderr)
        native_fps = None

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, _CPU_CACHE)
    numpy_fps = None
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if data.get("h") == H and data.get("w") == W:
            numpy_fps = data["fps"]
    if numpy_fps is None:
        t0 = time.perf_counter()
        numpy_hierarchical(left_np, right_np)
        dt = time.perf_counter() - t0
        numpy_fps = 1.0 / dt
        with open(cache, "w") as f:
            json.dump({"h": H, "w": W, "fps": numpy_fps, "seconds_per_frame": dt}, f)
    return native_fps, numpy_fps


def main():
    import os

    import jax

    # persistent compilation cache: the fused kernel's first compile is ~8 min
    # through the remote-compile tunnel; cached reruns skip it
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig, PyramidConfig
    from stepth_tpu.match import pallas_refine

    left_np, right_np = make_pair(H, W)
    # flagship single-chip config (BASELINE.md config 3): 1080p hierarchical
    # coarse-to-fine, all levels on Pallas kernels, effective 128-disparity
    # range (16 × 2^3)
    cfg = MatchConfig(num_disparities=128, window=9, cost="sad")
    pyr = PyramidConfig(levels=4, refine_radius=4, coarsest_disparities=16)

    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)

    # Chain iterations through a data dependency (the tunneled device completes
    # block_until_ready before execution finishes, so naive per-call timing
    # under-counts; a dependent chain + one readback measures real device time,
    # and the two-point difference removes the fixed round-trip overhead).
    fn = jax.jit(
        lambda l, r: pallas_refine.match_hierarchical_pallas(l, r, cfg, pyr).disparity
    )

    t0 = time.perf_counter()
    out = fn(left, right)
    _ = float(jnp.sum(out[:1, :8]))
    compile_s = time.perf_counter() - t0
    print(f"[bench] compile+first-step: {compile_s:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    def chain(n):
        l = left
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(l, right)
            l = left + out[:1, :1] * 1e-6
        _ = float(jnp.sum(out[:1, :8]))
        return time.perf_counter() - t0, out

    chain(2)  # warm
    # The two-point difference is noisy when a host-scheduling transient lands
    # in the short chain; repeat and take the median per-frame estimate.
    estimates = []
    out = None
    for _ in range(3):
        t1, _ = chain(10)
        t2, out = chain(60)
        estimates.append(max((t2 - t1) / 50, 1e-9))
    per_frame = sorted(estimates)[1]
    fps = 1.0 / per_frame
    print(
        f"[bench] tpu 1080p hierarchical-pallas (eff. D=128): {fps:.2f} frames/s"
        f" ({per_frame*1e3:.3f} ms/frame)",
        file=sys.stderr,
    )

    native_fps, numpy_fps = cpu_baseline_fps(left_np, right_np)
    if native_fps is not None:
        print(
            f"[bench] C++ 8-thread baseline: {native_fps:.2f} frames/s",
            file=sys.stderr,
        )
    print(f"[bench] numpy-cpu baseline: {numpy_fps:.4f} frames/s", file=sys.stderr)
    baseline_fps = native_fps if native_fps is not None else numpy_fps

    tpu_med = float(np.median(np.asarray(out)[50:-50, 100:-100]))
    print(f"[bench] median disparity tpu={tpu_med:.2f} want=24", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "stereo frames/s/chip at 1080p",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 1),
            }
        )
    )


def bench_extra():
    """Secondary metrics (stderr/manual): VGA dense fps and BA iters/s
    (BASELINE.md configs 2 and 5). Run with ``python bench.py --extra``."""
    import jax
    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig
    from stepth_tpu.match import pallas_dense

    # --- config 2: VGA, 64 disparities, fused kernel -------------------------
    lv, rv = make_pair(480, 640, shift=12, seed=1)
    cfg = MatchConfig(num_disparities=64, window=9, cost="sad", lr_threshold=1.0)
    f = jax.jit(lambda l, r: pallas_dense.match_pair_pallas(l, r, cfg).disparity)
    lj, rj = jnp.asarray(lv), jnp.asarray(rv)
    t0 = time.perf_counter()
    o = f(lj, rj)
    _ = float(jnp.sum(o[:1, :8]))
    print(f"[bench-extra] vga compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def chain(n):
        l = lj
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(l, rj)
            l = lj + o[:1, :1] * 1e-6
        _ = float(jnp.sum(o[:1, :8]))
        return time.perf_counter() - t0

    chain(3)
    t1, t2 = chain(4), chain(44)
    per = (t2 - t1) / 40
    print(
        f"[bench-extra] vga 64-disp fused: {per*1e3:.3f} ms/frame -> {1/per:.1f} fps",
        file=sys.stderr,
    )

    # --- config 1 workload on the native C++ host engine ---------------------
    try:
        from stepth_tpu import native
        from stepth_tpu.core import io as st_io

        main = st_io.open_rgb("/root/reference/assets/main.jpg")
        add = st_io.open_rgb("/root/reference/assets/additional.jpg")
        native.depth_from_additional(main, add, (36,) * 3)  # warm (build+cache)
        t0 = time.perf_counter()
        for _ in range(3):
            native.depth_from_additional(main, add, (36,) * 3)
        per = (time.perf_counter() - t0) / 3
        print(
            f"[bench-extra] native C++ reference pipeline 600x400:"
            f" {per*1e3:.0f} ms -> {1/per:.1f} fps (host CPU)",
            file=sys.stderr,
        )
    except Exception as e:  # no assets / no toolchain
        print(f"[bench-extra] native engine skipped: {e}", file=sys.stderr)

    # --- config 5: BA iters/s ------------------------------------------------
    from stepth_tpu.fusion import ba, geometry as geo

    rng = np.random.default_rng(0)
    n_cams, n_pts, obs_per_cam = 32, 4096, 2048
    intr = jnp.asarray([500.0, 500.0, 640.0, 360.0])
    pts = jnp.asarray(rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32))
    pts = pts.at[:, 2].add(10.0)
    poses = jnp.asarray(
        np.stack(
            [
                np.concatenate(
                    [rng.normal(0, 0.02, 3), [0.2 * c, 0.0, 0.0]]
                ).astype(np.float32)
                for c in range(n_cams)
            ]
        )
    )
    ci = jnp.asarray(np.repeat(np.arange(n_cams), obs_per_cam), jnp.int32)
    pi = jnp.asarray(
        rng.integers(0, n_pts, n_cams * obs_per_cam).astype(np.int32)
    )
    uv = geo.project(geo.transform(poses[ci], pts[pi]), intr)
    prob = ba.BAProblem(
        poses=poses + jnp.asarray(rng.normal(0, 0.01, poses.shape).astype(np.float32)),
        points=pts,
        intrinsics=intr,
        cam_idx=ci,
        pt_idx=pi,
        uv=uv,
        weight=jnp.ones(ci.shape[0], jnp.float32),
    )
    LM_ITERS, CG_ITERS = 10, 10
    solve = jax.jit(
        lambda p: ba.solve(p, iters=LM_ITERS, cg_iters=CG_ITERS), static_argnums=()
    )
    t0 = time.perf_counter()
    st = ba.solve(prob, iters=LM_ITERS, cg_iters=CG_ITERS)
    _ = float(st.cost)
    print(f"[bench-extra] ba compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def chain_ba(n):
        p = prob
        t0 = time.perf_counter()
        for _ in range(n):
            st = ba.solve(p, iters=LM_ITERS, cg_iters=CG_ITERS)
            p = p._replace(poses=st.poses, points=st.points)
        _ = float(st.cost)
        return time.perf_counter() - t0

    chain_ba(1)
    t1, t2 = chain_ba(2), chain_ba(10)
    per_solve = (t2 - t1) / 8
    iters_s = LM_ITERS / per_solve
    print(
        f"[bench-extra] BA ({n_cams} cams, {n_pts} pts, {n_cams*obs_per_cam} obs):"
        f" {per_solve*1e3:.1f} ms / {LM_ITERS} LM iters -> {iters_s:.1f} LM iters/s"
        f" (cost {float(st.cost):.2e})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if "--extra" in sys.argv:
        bench_extra()
    else:
        main()
