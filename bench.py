"""Benchmark harness. Prints ONE JSON line:

    {"metric": "stereo frames/s/chip at 1080p", "value": N,
     "unit": "frames/s", "vs_baseline": R}

``value`` is the recommended default backend's steady-state frames/s on one
chip at 1080p (config 3 of BASELINE.md): the best of the SAD-WTA flagship and
``hierarchical-sgm`` (the README default — same refine kernels, SGM coarse
prior; accuracy-equal-or-better per docs/ACCURACY_VGA.md, statistically equal
speed per the BASELINE.md round-5 correction). Both
per-backend numbers are always in the JSON (``flagship_fps``, ``hier_sgm``);
degraded/watchdog paths fall back to the flagship, which compiles first.
``vs_baseline`` is the speedup over
the **multithreaded C++ implementation of the same hierarchical pipeline**
(stepth_tpu/native engine, 8 threads — the honest stand-in for the reference's
compiled Rust + 8-way rayon, reference src/depth_image.rs:111-123; no Rust
toolchain in this environment). The single-threaded NumPy twin is also
measured and reported on stderr for continuity with round 1.

Extra configs (VGA dense, bundled-asset parity path) are reported on stderr so
stdout stays a single JSON line for the driver. The one JSON line also carries
secondary fields measured every round: ``edge_fps`` (the same flagship on
the edge-heavy box scene), ``production`` (the documented deployment
configuration, census cost + LR occlusion check, on both content classes)
and ``hier_sgm`` (the recommended default backend — SGM at the coarse
level). If the wall-clock budget expires during the secondary rows, the
completed headline is emitted without them (watchdog + try/finally).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H, W = 1088, 1920  # 1080p rounded to /32 for clean pyramid levels


def select_headline(partial, flagship_fps):
    """Pick the JSON headline: best of the flagship and the hierarchical-sgm
    secondary row (the README default backend), both measured this run.

    Mutates ``partial``: records ``flagship_fps`` (always, so the flagship
    stays regression-tracked) and ``headline_backend`` (the winner). Returns
    the headline fps. A missing/invalid hier_sgm row falls back to the
    flagship — the pre-round-5 behavior, so degraded paths are unchanged.
    Unit-pinned by tests/test_bench_headline.py (the driver artifact depends
    on this logic).
    """
    partial.setdefault("flagship_fps", round(float(flagship_fps), 2))
    try:
        hs_fps = float(partial.get("hier_sgm", {}).get("smooth_fps", 0.0))
    except (TypeError, ValueError, AttributeError):
        hs_fps = 0.0
    if hs_fps > flagship_fps:
        partial["headline_backend"] = "hierarchical-sgm"
        return hs_fps
    partial["headline_backend"] = "hierarchical-pallas"
    return float(flagship_fps)


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
        # single-thread pin (VERDICT r4 weak #8): the 8-thread number swings
        # with host throttling/scheduling; the 1-thread run of the identical
        # pipeline is the stable cross-round anchor (reported, not used for
        # vs_baseline — the reference's own deployment is 8-way rayon)
        t0 = time.perf_counter()
        native.hier_disparity(left_np, right_np, n_threads=1)
        one_t = time.perf_counter() - t0
        print(
            f"[bench] C++ 1-thread baseline (stability anchor): "
            f"{1.0/one_t:.3f} frames/s ({one_t:.2f} s/frame)",
            file=sys.stderr,
        )
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


def _tunnel_precheck(budget_s: float = 90.0) -> None:
    """Fail fast (exit 3, diagnostic on stderr) when the tunneled-TPU relay
    is unreachable — ``jax.devices()`` would otherwise retry-connect forever
    and the run dies as a silent watchdog kill instead of a clear error.
    Only active when the axon pool override points at a loopback relay."""
    import os
    import socket

    ip = os.environ.get("PALLAS_AXON_POOL_IPS", "")
    if ip != "127.0.0.1" or os.environ.get("JAX_PLATFORMS", "axon") != "axon":
        return
    deadline = time.monotonic() + budget_s
    while time.monotonic() < deadline:
        try:
            with socket.create_connection((ip, 8083), timeout=5):
                return
        except OSError:
            time.sleep(5)
    print(
        "[bench] FATAL: axon relay 127.0.0.1:8083 unreachable for "
        f"{budget_s:.0f}s — the TPU tunnel is down (relay process dead or "
        "grant service gone). No JSON emitted; restart the tunnel and rerun.",
        file=sys.stderr,
    )
    raise SystemExit(3)


def main():
    """Headline measurement, engineered to always emit its JSON line.

    Round-3 post-mortem (VERDICT r3 #1): the driver bench timed out mid-compile
    and produced *nothing* — a kernel edit had invalidated the persistent
    compile cache and the old structure compiled three separate flagship
    programs (fn, looped(5), looped(55)) through the remote-compile tunnel
    before printing anything. Structural fixes here:

    * ONE compiled program total: a traced-trip-count ``fori_loop`` serves the
      first-step check, the latency chain, and both two-point throughput
      measurements (and the edge-scene extra — same shapes ⇒ same executable).
    * CPU baselines run *before* any TPU work (fast, tunnel-independent), so
      the headline JSON prints the moment the throughput number exists.
    * A watchdog thread with a wall-clock budget (``STEPTH_BENCH_BUDGET_S``,
      default 480 s) emits a degraded-but-parseable JSON from whatever partial
      measurements exist instead of dying silently, then exits 0. The thread
      runs while the main thread is blocked inside XLA (GIL released).
    """
    import os
    import threading

    budget_s = float(os.environ.get("STEPTH_BENCH_BUDGET_S", "480"))
    t_start = time.monotonic()
    partial: dict = {}
    emitted = threading.Event()

    def emit(value, vs_baseline, degraded=False, reason=None):
        if emitted.is_set():
            return
        emitted.set()
        obj = {
            "metric": "stereo frames/s/chip at 1080p",
            "value": round(float(value), 2),
            "unit": "frames/s",
            "vs_baseline": round(float(vs_baseline), 1),
        }
        # secondary rows measured before the emit land as extra fields (the
        # driver parses metric/value/unit/vs_baseline; these regression-track
        # the other content class and the documented production deployment
        # configuration census + lr_check — VERDICT r4 #2)
        for key in ("flagship_fps", "edge_fps", "production", "hier_sgm",
                    "headline_backend"):
            if key in partial:
                obj[key] = partial[key]
        if degraded:
            obj["degraded"] = True
            obj["degraded_reason"] = reason
        print(json.dumps(obj), flush=True)

    def watchdog():
        remaining = budget_s - (time.monotonic() - t_start)
        if remaining > 0:
            emitted.wait(remaining)
        if emitted.is_set():
            return
        base = partial.get("baseline_fps") or 1e-9
        if "headline_fps" in partial:
            # the headline finished; only secondary rows were still running —
            # emit the real number, not a degraded one
            print("[bench] WATCHDOG: budget exhausted during secondary rows; "
                  "emitting the completed headline", file=sys.stderr, flush=True)
            best = select_headline(partial, partial["headline_fps"])
            emit(best, best / base)
            os._exit(0)
        if "latency_fps" in partial:
            val, why = partial["latency_fps"], (
                "budget hit before device-throughput loop; value is the "
                "dispatch-chained latency rate"
            )
        elif "first_step_s" in partial:
            val, why = 1.0 / partial["first_step_s"], (
                "budget hit after first step; value is 1/(first-step time), "
                "a gross underestimate"
            )
        else:
            val, why = 0.0, "budget hit during compile; no measurement exists"
        print(f"[bench] WATCHDOG: {budget_s:.0f}s budget exhausted — {why}",
              file=sys.stderr, flush=True)
        emit(val, val / base, degraded=True, reason=why)
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    _tunnel_precheck()

    left_np, right_np = make_pair(H, W)

    # CPU baselines first: tunnel-independent and ~seconds (numpy twin is
    # cached in BENCH_CPU_BASELINE.json after its one ~100 s measurement).
    native_fps, numpy_fps = cpu_baseline_fps(left_np, right_np)
    if native_fps is not None:
        print(f"[bench] C++ 8-thread baseline: {native_fps:.2f} frames/s",
              file=sys.stderr)
    print(f"[bench] numpy-cpu baseline: {numpy_fps:.4f} frames/s", file=sys.stderr)
    baseline_fps = native_fps if native_fps is not None else numpy_fps
    partial["baseline_fps"] = baseline_fps

    import jax

    # persistent compilation cache: a cold compile of the flagship program is
    # ~3-8 min through the remote-compile tunnel; cached reruns take seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig, PyramidConfig
    from stepth_tpu.match import pallas_refine

    # flagship single-chip config (BASELINE.md config 3): 1080p hierarchical
    # coarse-to-fine, all levels on Pallas kernels, effective 128-disparity
    # range (16 × 2^3)
    cfg = MatchConfig(num_disparities=128, window=9, cost="sad")
    pyr = PyramidConfig(levels=4, coarsest_disparities=16)

    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)

    # THE one compiled program. Trip count ``n`` is a traced argument, so
    # every call below — first step (n=1), latency chain (n=1 per dispatch),
    # both throughput points (n=5/55) and the edge scene — reuses this
    # executable. Iterations chain through a data dependency (the tunneled
    # device returns from block_until_ready before execution finishes, so
    # naive per-call timing under-counts; a dependent chain + one readback
    # measures real device time, and two-point differences remove the fixed
    # dispatch/readback overhead).
    @jax.jit
    def run_n(l0, r, n):
        def body(_, carry):
            l, _d = carry
            d = pallas_refine.match_hierarchical_pallas(l, r, cfg, pyr).disparity
            return (l0 + d[:1, :1] * 1e-6, d)

        return jax.lax.fori_loop(
            0, n, body, (l0, jnp.zeros(l0.shape, jnp.float32))
        )[1]

    t0 = time.perf_counter()
    out = run_n(left, right, 1)
    _ = float(jnp.sum(out[:1, :8]))
    compile_s = time.perf_counter() - t0
    partial["first_step_s"] = compile_s
    print(f"[bench] compile+first-step: {compile_s:.1f}s on {jax.devices()[0]}",
          file=sys.stderr)

    def chain(n):
        l = left
        t0 = time.perf_counter()
        for _ in range(n):
            out = run_n(l, right, 1)
            l = left + out[:1, :1] * 1e-6
        _ = float(jnp.sum(out[:1, :8]))
        return time.perf_counter() - t0, out

    chain(2)  # warm
    # Latency including one host dispatch round-trip per frame (the axon
    # tunnel adds ~2 ms/dispatch that a local host would not pay); median of
    # three two-point estimates.
    estimates = []
    for _ in range(3):
        t1, _ = chain(10)
        t2, out = chain(30)
        estimates.append(max((t2 - t1) / 20, 1e-9))
    lat_frame = sorted(estimates)[1]
    partial["latency_fps"] = 1.0 / lat_frame
    print(
        f"[bench] dispatch-chained latency: {1.0/lat_frame:.2f} frames/s"
        f" ({lat_frame*1e3:.3f} ms/frame incl. host round-trip)",
        file=sys.stderr,
    )

    def throughput(l, r, reps=3):
        """Two-point (n=5 vs n=55) device throughput, median of ``reps``."""
        est = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run_n(l, r, 5)[:1, :8]))
            t1 = time.perf_counter()
            _ = float(jnp.sum(run_n(l, r, 55)[:1, :8]))
            t2 = time.perf_counter()
            est.append(((t2 - t1) - (t1 - t0)) / 50)
        return sorted(est)[len(est) // 2]

    # Headline THROUGHPUT: frames computed back-to-back on the device.
    # Sustained streaming reaches this rate because host dispatches overlap
    # device execution.
    throughput(left, right, reps=1)  # warm both trip counts
    per_frame = throughput(left, right)
    fps = 1.0 / per_frame
    print(
        f"[bench] tpu 1080p hierarchical-pallas (eff. D=128): {fps:.2f} frames/s"
        f" ({per_frame*1e3:.3f} ms/frame device throughput)",
        file=sys.stderr,
    )

    tpu_med = float(np.median(np.asarray(out)[50:-50, 100:-100]))
    print(f"[bench] median disparity tpu={tpu_med:.2f} want=24", file=sys.stderr)
    partial["headline_fps"] = fps  # watchdog emits this if secondary rows stall

    # The secondary rows below (edge scene + the production census+LR
    # executable, a fresh multi-minute compile on a cold cache) run inside a
    # try/finally whose finally IS the emit: the headline JSON survives
    # SystemExit/KeyboardInterrupt/tunnel BaseErrors during them, restoring
    # the round-3 guarantee that the headline prints once it exists. (The
    # watchdog separately covers wall-clock overrun; nothing covers SIGKILL.)
    try:
        _secondary_rows(partial, throughput, H, W)
    finally:
        # Headline = recommended default backend (README): best of the SAD-WTA
        # flagship and hierarchical-sgm, measured THIS run (select_headline).
        best = select_headline(partial, fps)
        emit(best, best / baseline_fps)


def _secondary_rows(partial, throughput, H, W):
    import jax
    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig, PyramidConfig
    from stepth_tpu.match import pallas_refine

    left_np, right_np = make_pair(H, W)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    pyr = PyramidConfig(levels=4, coarsest_disparities=16)

    # Edge-bearing scene (VERDICT r3 #3): the smooth headline texture lets
    # every tile take the single-window fast path; the box scene (layered
    # occlusion, disparity steps ≈ 0.3·dmax) exercises the multi-window
    # machinery. Same shapes ⇒ same executable, no extra compile.
    le = re_ = None
    try:
        from stepth_tpu.utils import scenes

        sc = scenes.make_scene("box", H, W, 128, seed=1)
        le, re_ = jnp.asarray(sc.left), jnp.asarray(sc.right)
        throughput(le, re_, reps=1)
        per_edge = throughput(le, re_)
        partial["edge_fps"] = round(1.0 / per_edge, 2)
        print(
            f"[bench] edge-scene (box) 1080p: {1.0/per_edge:.2f} frames/s"
            f" ({per_edge*1e3:.3f} ms/frame device throughput)",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001 — extra credit only
        print(f"[bench] edge-scene extra skipped: {e}", file=sys.stderr)

    # PRODUCTION configuration (VERDICT r4 #2): census + lr_check=True is what
    # README tells real rigs to deploy (README.md quickstart) — measure it
    # every round on both content classes so a regression in the census
    # bit-planes or the LR epilogue shows up in the driver artifact, not just
    # in one-off tool runs. Separate executable (census cost + LR epilogue);
    # the persistent compile cache makes reruns cheap.
    try:
        prod_cfg = MatchConfig(num_disparities=128, window=9, cost="census")

        @jax.jit
        def run_prod(l0, r, n):
            def body(_, carry):
                l, _d = carry
                d = pallas_refine.match_hierarchical_pallas(
                    l, r, prod_cfg, pyr, lr_check=True
                ).disparity
                return (l0 + d[:1, :1] * 1e-6, d)

            return jax.lax.fori_loop(
                0, n, body, (l0, jnp.zeros(l0.shape, jnp.float32))
            )[1]

        def prod_throughput(l, r, reps=3):
            est = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(jnp.sum(run_prod(l, r, 5)[:1, :8]))
                t1 = time.perf_counter()
                _ = float(jnp.sum(run_prod(l, r, 55)[:1, :8]))
                t2 = time.perf_counter()
                est.append(((t2 - t1) - (t1 - t0)) / 50)
            return sorted(est)[len(est) // 2]

        t0 = time.perf_counter()
        prod_throughput(left, right, reps=1)  # compile + warm
        print(f"[bench] production compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        per_prod = prod_throughput(left, right)
        prod = {"config": "census+lr", "smooth_fps": round(1.0 / per_prod, 2)}
        print(
            f"[bench] PRODUCTION census+LR smooth 1080p: {1.0/per_prod:.2f}"
            f" frames/s ({per_prod*1e3:.3f} ms/frame device throughput)",
            file=sys.stderr,
        )
        if le is not None:
            prod_throughput(le, re_, reps=1)
            per_pe = prod_throughput(le, re_)
            prod["edge_fps"] = round(1.0 / per_pe, 2)
            print(
                f"[bench] PRODUCTION census+LR edge-scene (box) 1080p:"
                f" {1.0/per_pe:.2f} frames/s ({per_pe*1e3:.3f} ms/frame)",
                file=sys.stderr,
            )
        partial["production"] = prod
    except Exception as e:  # noqa: BLE001
        print(f"[bench] production row skipped: {e}", file=sys.stderr)

    # hierarchical-sgm (round 5): the recommended default backend — SGM
    # robustness at the coarse level AND the fastest 1080p path (its smoother
    # coarse prior plans fewer refine windows). Third executable; same
    # watchdog/finally protections.
    try:
        from stepth_tpu.match.sgm import SGMConfig

        hs_cfg = MatchConfig(num_disparities=128, window=9, cost="sad")
        hs_sgm = SGMConfig(directions=4)

        @jax.jit
        def run_hs(l0, r, n):
            def body(_, carry):
                l, _d = carry
                d = pallas_refine.match_hierarchical_pallas(
                    l, r, hs_cfg, pyr, coarse_backend="sgm", sgm=hs_sgm
                ).disparity
                return (l0 + d[:1, :1] * 1e-6, d)

            return jax.lax.fori_loop(
                0, n, body, (l0, jnp.zeros(l0.shape, jnp.float32))
            )[1]

        def hs_throughput(l, r, reps=3):
            est = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(jnp.sum(run_hs(l, r, 5)[:1, :8]))
                t1 = time.perf_counter()
                _ = float(jnp.sum(run_hs(l, r, 55)[:1, :8]))
                t2 = time.perf_counter()
                est.append(((t2 - t1) - (t1 - t0)) / 50)
            return sorted(est)[len(est) // 2]

        hs_throughput(left, right, reps=1)  # compile + warm
        per_hs = hs_throughput(left, right)
        row = {"smooth_fps": round(1.0 / per_hs, 2)}
        print(
            f"[bench] hierarchical-sgm 1080p: {1.0/per_hs:.2f} frames/s"
            f" ({per_hs*1e3:.3f} ms/frame device throughput)",
            file=sys.stderr,
        )
        if le is not None:
            hs_throughput(le, re_, reps=1)
            per_he = hs_throughput(le, re_)
            row["edge_fps"] = round(1.0 / per_he, 2)
            print(
                f"[bench] hierarchical-sgm edge-scene (box) 1080p:"
                f" {1.0/per_he:.2f} frames/s ({per_he*1e3:.3f} ms/frame)",
                file=sys.stderr,
            )
        partial["hier_sgm"] = row
    except Exception as e:  # noqa: BLE001
        print(f"[bench] hierarchical-sgm row skipped: {e}", file=sys.stderr)


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
    lj, rj = jnp.asarray(lv), jnp.asarray(rv)

    # device throughput via an in-jit dependency chain (same two-point
    # methodology as the headline) — a Python dispatch loop here would just
    # measure the axon tunnel's per-dispatch latency (1–3 ms, variable).
    def vga_loop(n):
        def body(_, carry):
            l, acc = carry
            d = pallas_dense.match_pair_pallas(l, rj, cfg).disparity
            return l + d[:1, :1] * 1e-30, acc + d[:1, :1]

        return jax.jit(
            lambda l0: jax.lax.fori_loop(
                0, n, body, (l0, jnp.zeros((1, 1), jnp.float32))
            )[1]
        )

    t0 = time.perf_counter()
    f3, f43 = vga_loop(3), vga_loop(43)
    for f in (f3, f43):
        _ = float(jnp.sum(f(lj)))
    print(f"[bench-extra] vga compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    _ = float(jnp.sum(f3(lj)))
    t1 = time.perf_counter()
    _ = float(jnp.sum(f43(lj)))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / 40
    print(
        f"[bench-extra] vga 64-disp fused: {per*1e3:.3f} ms/frame -> {1/per:.1f} fps"
        f" (device throughput)",
        file=sys.stderr,
    )

    # --- accuracy backend: all-Pallas SGM, 1080p / D=64 / 4 directions -------
    from stepth_tpu.match import pallas_sgm, sgm as sgm_mod

    l1, r1 = make_pair(H, W, shift=24, seed=2)
    l1j, r1j = jnp.asarray(l1), jnp.asarray(r1)
    sgm_cfg = MatchConfig(num_disparities=64, window=5, cost="sad", lr_threshold=1.0)
    sgm_sc = sgm_mod.SGMConfig(directions=4)

    def sgm_loop(n):
        def body(_, carry):
            l, acc = carry
            d = pallas_sgm.match_pair_sgm_pallas(l, r1j, sgm_cfg, sgm_sc).disparity
            return l + d[:1, :1] * 1e-30, acc + d[:1, :1]

        return jax.jit(
            lambda l0: jax.lax.fori_loop(
                0, n, body, (l0, jnp.zeros((1, 1), jnp.float32))
            )[1]
        )

    t0 = time.perf_counter()
    s2, s8 = sgm_loop(2), sgm_loop(8)
    for f in (s2, s8):
        _ = float(jnp.sum(f(l1j)))
    print(f"[bench-extra] sgm compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    est = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(s2(l1j)))
        t1 = time.perf_counter()
        _ = float(jnp.sum(s8(l1j)))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / 6)
    per = sorted(est)[1]
    print(
        f"[bench-extra] sgm-pallas 1080p D=64 4-dir: {per*1e3:.2f} ms/frame ->"
        f" {1/per:.1f} fps (device throughput)",
        file=sys.stderr,
    )

    # --- hybrid: hierarchical flagship with SGM at the coarsest level --------
    from stepth_tpu.config import PyramidConfig
    from stepth_tpu.match import pallas_refine

    hcfg = MatchConfig(num_disparities=128, window=9, cost="sad")
    hpyr = PyramidConfig(levels=4, coarsest_disparities=16)

    def hsgm_loop(n):
        def body(_, carry):
            l, acc = carry
            d = pallas_refine.match_hierarchical_pallas(
                l, r1j, hcfg, hpyr, coarse_backend="sgm", sgm=sgm_sc
            ).disparity
            return l + d[:1, :1] * 1e-30, acc + d[:1, :1]

        return jax.jit(
            lambda l0: jax.lax.fori_loop(
                0, n, body, (l0, jnp.zeros((1, 1), jnp.float32))
            )[1]
        )

    t0 = time.perf_counter()
    hs3, hs43 = hsgm_loop(3), hsgm_loop(43)
    for f in (hs3, hs43):
        _ = float(jnp.sum(f(l1j)))
    print(
        f"[bench-extra] hier-sgm compile+first: {time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )
    # median of 3 two-point estimates: a single estimate under-reports when a
    # host transient inflates the subtracted short-loop baseline — exactly how
    # the round-5 "0.98 ms" hier-sgm figure happened (it measures 1.27-1.35 ms
    # under medians, statistically equal to the flagship; BASELINE.md round-5
    # correction)
    est = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(hs3(l1j)))
        t1 = time.perf_counter()
        _ = float(jnp.sum(hs43(l1j)))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / 40)
    per = sorted(est)[1]
    print(
        f"[bench-extra] hierarchical-sgm 1080p eff-D=128 (SGM coarse, 4-dir):"
        f" {per*1e3:.2f} ms/frame -> {1/per:.1f} fps (device throughput)",
        file=sys.stderr,
    )

    # --- honest CPU baseline for the SGM accuracy backend --------------------
    try:
        from stepth_tpu import native as native_sgm_mod

        if native_sgm_mod.available():
            t0 = time.perf_counter()
            native_sgm_mod.sgm_disparity(
                l1, r1, num_disparities=64, window=5, directions=4,
                lr_threshold=1.0, n_threads=8,
            )
            per = time.perf_counter() - t0
            print(
                f"[bench-extra] native C++ SGM 1080p D=64 4-dir (8 threads):"
                f" {per:.2f} s/frame -> {1/per:.3f} fps (bit-identical"
                f" pipeline; the Pallas backend's honest CPU baseline)",
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001
        print(f"[bench-extra] native SGM skipped: {e}", file=sys.stderr)

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

    # --- config 4: streamed stereo video (loader → matcher → temporal) ------
    from stepth_tpu.config import PyramidConfig
    from stepth_tpu.core.loader import PrefetchLoader
    from stepth_tpu.match import pallas_refine

    vcfg = MatchConfig(num_disparities=128, window=9, cost="sad")
    vpyr = PyramidConfig(levels=4, coarsest_disparities=16)
    vh, vw = 1088, 1920
    n_frames = 24
    rng = np.random.default_rng(2)
    base_l, base_r = make_pair(vh, vw, shift=24, seed=2)

    def synth(i):
        # per-frame brightness wobble — cheap host-side "decode"; u8 frames
        # (what a video decoder produces; 4× less H2D than f32)
        s = 1.0 + 0.01 * (i % 5)
        return (
            np.clip(base_l * s, 0, 255).astype(np.uint8),
            np.clip(base_r * s, 0, 255).astype(np.uint8),
        )

    step = jax.jit(
        lambda l, r, prev: (
            lambda d: (d, 0.7 * d + 0.3 * prev)  # streaming EMA temporal smooth
        )(
            pallas_refine.match_hierarchical_pallas(
                l.astype(jnp.float32), r.astype(jnp.float32), vcfg, vpyr
            ).disparity
        )
    )
    l0, r0 = synth(0)
    ema = jnp.zeros((vh, vw), jnp.float32)
    d, ema = step(jnp.asarray(l0), jnp.asarray(r0), ema)  # compile
    _ = float(jnp.sum(d[:1, :8]))
    loader = PrefetchLoader(range(n_frames), synth, num_threads=4, buffer=6,
                            device_put=True)
    t0 = time.perf_counter()
    for l_np, r_np in loader:
        d, ema = step(l_np, r_np, ema)
    _ = float(jnp.sum(ema[:1, :8]))
    dt = time.perf_counter() - t0
    print(
        f"[bench-extra] config-4 video 1080p end-to-end"
        f" (loader→H2D→hierarchical→EMA, {n_frames} u8 frame pairs):"
        f" {n_frames/dt:.1f} frames/s ({dt/n_frames*1e3:.1f} ms/frame)."
        f" NOTE: H2D rides the remote axon tunnel here (~4 MB/frame); on a"
        f" local host PCIe H2D is >100× faster and the device rate below is"
        f" the bound.",
        file=sys.stderr,
    )

    # device-bound rate of the same per-frame step (frames resident):
    lj, rj = jnp.asarray(l0), jnp.asarray(r0)

    def vid_loop(n):
        def body(_, carry):
            e, x = carry
            d, e = step(lj + x, rj, e)
            return e, (d[:1, :1] * 1e-30).astype(jnp.uint8)

        return jax.jit(
            lambda e: jax.lax.fori_loop(
                0, n, body, (e, jnp.zeros((1, 1), jnp.uint8))
            )[0]
        )

    f1, f2 = vid_loop(5), vid_loop(25)
    for f in (f1, f2):
        _ = float(jnp.sum(f(ema)[:1, :8]))
    est = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f1(ema)[:1, :8]))
        t1 = time.perf_counter()
        _ = float(jnp.sum(f2(ema)[:1, :8]))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / 20)
    per = sorted(est)[1]
    print(
        f"[bench-extra] config-4 video 1080p device-side step rate"
        f" (match+EMA): {1/per:.1f} frames/s ({per*1e3:.2f} ms/frame)",
        file=sys.stderr,
    )

    # temporally-seeded video (round 4): non-keyframe frames run only the
    # full-res refine seeded by the previous frame's disparity. Two-point
    # over clip lengths so the per-clip dispatch round-trip cancels.
    from stepth_tpu.config import PyramidConfig
    from stepth_tpu.models import StereoModel

    vm = StereoModel(
        backend="hierarchical-pallas",
        match=MatchConfig(num_disparities=128, window=9, cost="sad"),
        pyramid=PyramidConfig(levels=4,
                              coarsest_disparities=16),
    )
    run_vid = jax.jit(vm.video(keyframe_interval=8))
    t1n, t2n = 8, 32
    clips = {
        n: (jnp.asarray(np.stack([np.asarray(lj)] * n).astype(np.float32)),
            jnp.asarray(np.stack([np.asarray(rj)] * n).astype(np.float32)))
        for n in (t1n, t2n)
    }
    for n in (t1n, t2n):
        _ = float(jnp.sum(run_vid(*clips[n]).disparity[-1, :1, :8]))
    est = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(run_vid(*clips[t1n]).disparity[-1, :1, :8]))
        t1 = time.perf_counter()
        _ = float(jnp.sum(run_vid(*clips[t2n]).disparity[-1, :1, :8]))
        t2 = time.perf_counter()
        est.append(((t2 - t1) - (t1 - t0)) / (t2n - t1n))
    per = sorted(est)[1]
    print(
        f"[bench-extra] temporal-video 1080p (keyframe-8, StereoModel.video):"
        f" {1/per:.1f} frames/s ({per*1e3:.2f} ms/frame device throughput)",
        file=sys.stderr,
    )

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


def bench_profile():
    """Per-stage timing of the flagship hierarchical pipeline on the real
    chip (``python bench.py --profile``): coarse matcher, each refine level,
    median, and the XLA glue, using the same chained-dependency methodology."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig
    from stepth_tpu.match import pallas_dense, pallas_post, pallas_refine
    from stepth_tpu.match import pyramid as pyr_mod

    cfg = MatchConfig(num_disparities=128, window=9, cost="sad")
    left_np, right_np = make_pair(H, W)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)

    def timeit(name, fn, *args):
        """Device-side iteration timing: the stage runs N times inside ONE jit
        via ``lax.fori_loop`` with a scalar data dependency chaining iterations,
        so per-dispatch/tunnel overhead (≈1 ms/call here) cancels entirely.
        Returns ms/iteration from a two-point (N₁, N₂) difference."""

        def looped(n):
            def body(_, x):
                out = fn(x, *args[1:])
                return x + jnp.ravel(out)[0] * 1e-30

            return jax.jit(lambda a: jax.lax.fori_loop(0, n, body, a))

        f1, f2 = looped(5), looped(55)
        for f in (f1, f2):
            _ = float(jnp.ravel(f(args[0]))[0])  # compile + warm

        est = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.ravel(f1(args[0]))[0])
            t1 = time.perf_counter()
            _ = float(jnp.ravel(f2(args[0]))[0])
            t2 = time.perf_counter()
            est.append(((t2 - t1) - (t1 - t0)) / 50)
        ms = sorted(est)[1] * 1e3
        print(f"[profile] {name}: {ms:.3f} ms", file=sys.stderr)
        return ms

    # pyramid levels
    shapes = [(H >> l, W >> l) for l in range(4)]
    imgs = {0: (left, right)}
    for l in range(1, 4):
        imgs[l] = (
            pyr_mod.downsample2(imgs[l - 1][0]),
            pyr_mod.downsample2(imgs[l - 1][1]),
        )
        imgs[l] = tuple(jnp.asarray(np.asarray(x)) for x in imgs[l])

    total = 0.0
    total += timeit(
        "downsample chain (3 levels, both images)",
        lambda l, r: pyr_mod.downsample2(
            pyr_mod.downsample2(pyr_mod.downsample2(l))
        )
        + pyr_mod.downsample2(pyr_mod.downsample2(pyr_mod.downsample2(r)))[0, 0],
        left,
        right,
    )

    coarse_cfg = MatchConfig(
        num_disparities=16, window=9, cost="sad", lr_threshold=None
    )
    total += timeit(
        f"coarse fused match {shapes[3]} D=16",
        lambda l, r: pallas_dense.raw_match(l, r, coarse_cfg, tile_rows=16)[0],
        imgs[3][0],
        imgs[3][1],
    )

    # per-level refine at the shipping defaults (round 5: R=2, nw=12, final
    # level nw=16, tile_rows=64 — PyramidConfig/match_hierarchical_pallas)
    from stepth_tpu.config import PyramidConfig as _PC

    _pyr_defaults = _PC()
    max_base = 16
    for lvl in (2, 1, 0):
        h, w = shapes[lvl]
        max_base *= 2
        r_lvl = _pyr_defaults.final_radius if lvl == 0 else _pyr_defaults.refine_radius
        nw_lvl = (
            _pyr_defaults.final_windows if lvl == 0 else _pyr_defaults.refine_windows
        )
        prior = jnp.full((h, w), 12.0, jnp.float32)
        total += timeit(
            f"refine level {lvl} {h}x{w} base<={max_base} R={r_lvl} nw<={nw_lvl}",
            lambda l, r, p, mb=max_base, rl=r_lvl, nwl=nw_lvl:
            pallas_refine.refine_level(
                l, r, p, cfg, rl, mb, 64, max_windows=nwl
            ),
            imgs[lvl][0],
            imgs[lvl][1],
            prior,
        )

    total += timeit(
        "median3 1080p", lambda x: pallas_post.median3_pallas(x), left
    )
    total += timeit(
        "upsample2_disparity to 1080p",
        lambda x: pyr_mod.upsample2_disparity(x, H, W),
        jnp.zeros((H // 2, W // 2), jnp.float32),
    )
    print(f"[profile] stage sum: {total:.3f} ms", file=sys.stderr)

    from stepth_tpu.config import PyramidConfig

    pyrc = PyramidConfig(levels=4, coarsest_disparities=16)
    timeit(
        "FULL hierarchical-pallas 1080p (device-loop)",
        lambda l, r: pallas_refine.match_hierarchical_pallas(
            l, r, cfg, pyrc
        ).disparity,
        left,
        right,
    )


def bench_profile_sgm():
    """Per-stage timing of the Pallas SGM pipeline (``--profile-sgm``):
    volume emit, volume transpose, one horizontal + one vertical scan pass,
    WTA-from-volume, and the full pipeline — each in f32 and bf16 volume
    modes. The scans are HBM-bound, so these stages should scale with the
    volume's byte size."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp

    from stepth_tpu.config import MatchConfig
    from stepth_tpu.match import dense, pallas_sgm
    from stepth_tpu.match import sgm as sgm_mod

    cfg = MatchConfig(num_disparities=64, window=5, cost="sad", lr_threshold=1.0)
    left_np, right_np = make_pair(H, W)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    lg = dense.grayscale(left)
    rg = dense.grayscale(right)

    def timeit(name, fn, *args, n2=25):
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
        print(f"[profile-sgm] {name}: {ms:.3f} ms", file=sys.stderr)
        return ms

    for vname, vdt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        vol, (h, w, hp, wp) = pallas_sgm._aggregated_volume(
            lg, rg, cfg, 16, False, dtype=vdt
        )
        vol.block_until_ready()
        gb = vol.size * vol.dtype.itemsize / 1e9
        print(
            f"[profile-sgm] --- volume {vname}: [{cfg.num_disparities},{hp},{wp}]"
            f" = {gb:.2f} GB ---",
            file=sys.stderr,
        )
        timeit(
            f"{vname} volume emit",
            lambda l, r, dt=vdt: pallas_sgm._aggregated_volume(
                dense.grayscale(l), dense.grayscale(r), cfg, 16, False, dtype=dt
            )[0],
            left,
            right,
            n2=12,
        )
        volT = jnp.swapaxes(vol, 1, 2)
        timeit(f"{vname} transpose [D,hp,wp]->[D,wp,hp]",
               lambda v: jnp.swapaxes(v, 1, 2), vol, n2=12)
        timeit(
            f"{vname} horizontal scan pass (on volT)",
            lambda v: pallas_sgm._scan_direction(
                v, None, S_real=w, T_real=h, p1=40.0, p2=160.0, reverse=False
            ),
            volT,
            n2=12,
        )
        timeit(
            f"{vname} vertical scan pass (+acc)",
            lambda v: pallas_sgm._scan_direction(
                v, v, S_real=h, T_real=w, p1=40.0, p2=160.0, reverse=False
            ),
            vol,
            n2=12,
        )
        timeit(
            f"{vname} WTA-from-volume",
            lambda v: pallas_sgm._wta_from_volume(v, Wr=w, cfg=cfg, tile_rows=16)[0],
            vol,
            n2=12,
        )
        sc = sgm_mod.SGMConfig(directions=4, volume_dtype=vname if vname == "bf16" else "f32")
        timeit(
            f"{vname} FULL sgm-pallas 1080p D=64 4-dir",
            lambda l, r, s=sc: pallas_sgm.match_pair_sgm_pallas(
                l, r, cfg, s
            ).disparity,
            left,
            right,
            n2=12,
        )


if __name__ == "__main__":
    if "--profile-sgm" in sys.argv:
        bench_profile_sgm()
        raise SystemExit(0)
    if "--extra" in sys.argv:
        bench_extra()
    elif "--profile" in sys.argv:
        bench_profile()
    else:
        main()
