"""Config-4 transport closure (round-2 VERDICT #9 / round-3 #8): is the
video pipeline's end-to-end rate through the remote axon tunnel a transport
floor, or can batching/layout win it back?

Measures, on the real chip:

1. raw H2D bandwidth through the tunnel for one 1080p u8 frame pair
   (4.2 MB), and for batched transfers of 2/4/8 frame pairs in one
   ``device_put`` — amortizing the per-transfer round-trip;
2. the device-side per-frame step rate (already known ~device-bound);
3. the implied end-to-end rate per batch size = 1 / (H2D/frame + step),
   assuming transfer/compute overlap is NOT available (worst case — the
   loader thread does overlap in practice, so the truth is ≥ this).

Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 1088, 1920


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (2, H, W), np.uint8)  # one l/r pair

    rows = []
    for batch in (1, 2, 4, 8):
        payload = np.repeat(frame[None], batch, axis=0)  # [batch, 2, H, W]
        nbytes = payload.nbytes
        # warm (allocator, tunnel session)
        x = jax.device_put(payload, dev)
        _ = float(jnp.sum(x[0, 0, :1, :8]))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            x = jax.device_put(payload, dev)
            _ = float(jnp.sum(x[0, 0, :1, :8]))  # force completion
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        per_frame_ms = dt / batch * 1e3
        bw = nbytes / dt / 1e6
        rows.append((batch, nbytes / 1e6, dt * 1e3, per_frame_ms, bw))
        print(
            f"[transport] batch={batch}: {nbytes/1e6:.1f} MB in {dt*1e3:.1f} ms"
            f" -> {per_frame_ms:.1f} ms/frame-pair, {bw:.0f} MB/s",
            file=sys.stderr,
        )

    print("| frame pairs / transfer | MB | transfer ms | ms per frame pair |"
          " MB/s |")
    print("|---|---|---|---|---|")
    for b, mb, ms, pf, bw in rows:
        print(f"| {b} | {mb:.1f} | {ms:.1f} | {pf:.1f} | {bw:.0f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
