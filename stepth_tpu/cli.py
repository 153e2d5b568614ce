"""Command-line interface.

The reference ships no binary (SURVEY.md §1: library only); this CLI is a
convenience wrapper over the same public API a library user calls.

    python -m stepth_tpu depth MAIN ADD OUT         # reference-parity depth
    python -m stepth_tpu depth MAIN ADD OUT --backend native
    python -m stepth_tpu stereo LEFT RIGHT OUT      # dense fast path
    python -m stepth_tpu foreground MAIN ADD OUT    # README foreground flow
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _cmd_depth(args) -> int:
    from stepth_tpu.core import io

    main = io.open_rgb(args.main)
    add = io.open_rgb(args.additional)
    prec = (args.precision,) * 3
    if args.backend == "native":
        from stepth_tpu import native

        depth = native.depth_from_additional(main, add, prec)
    elif args.backend == "oracle":
        from stepth_tpu.oracle import pipeline

        depth = pipeline.depth_from_additional_oracle(main, add, prec)
    else:
        from stepth_tpu.match import parity

        depth = np.asarray(parity.depth_from_additional(main, add, prec))
    io.save(args.out, depth)
    print(f"wrote {args.out} ({depth.shape[1]}x{depth.shape[0]})")
    return 0


def _cmd_stereo(args) -> int:
    from stepth_tpu.core import io
    from stepth_tpu.match import dense
    from stepth_tpu.models import StereoModel
    from stepth_tpu.config import MatchConfig

    left = io.open_rgb(args.left)
    right = io.open_rgb(args.right)
    model = StereoModel(
        backend=args.backend,
        match=MatchConfig(num_disparities=args.disparities, window=args.window,
                          cost=args.cost),
        lr_check=args.lr_check,
    )
    res = model(left, right)
    depth = np.asarray(dense.disparity_to_depth_u8(res.disparity, args.disparities))
    io.save(args.out, depth)
    print(f"wrote {args.out} ({depth.shape[1]}x{depth.shape[0]})")
    return 0


def _cmd_foreground(args) -> int:
    from stepth_tpu import DepthFrame
    from stepth_tpu.core import io

    frame = DepthFrame.open(args.main).open_depth_from_additional(
        args.additional, (args.precision,) * 3
    )
    out = frame.invert_depth().select_foreground().apply_mask()
    out.save(args.out)  # quirk Q7: saves the masked image, like the reference
    print(f"wrote {args.out}")
    return 0


def _honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu python -m stepth_tpu …`` actually run on CPU.

    Site customizations that register an out-of-tree TPU backend (e.g. a
    tunneled chip) can pin the platform selection before user code runs; the
    env var alone then loses. An explicit config update wins, same pattern as
    ``__graft_entry__.dryrun_multichip``."""
    import os

    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def main(argv=None) -> int:
    _honor_platform_env()
    p = argparse.ArgumentParser(prog="stepth_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("depth", help="reference-parity depth from an additional view")
    d.add_argument("main")
    d.add_argument("additional")
    d.add_argument("out")
    d.add_argument("--precision", type=int, default=36)
    d.add_argument("--backend", choices=["jax", "native", "oracle"], default="jax")
    d.set_defaults(fn=_cmd_depth)

    s = sub.add_parser("stereo", help="dense rectified-stereo disparity")
    s.add_argument("left")
    s.add_argument("right")
    s.add_argument("out")
    s.add_argument("--disparities", type=int, default=64)
    s.add_argument("--window", type=int, default=9)
    s.add_argument("--cost", choices=["sad", "ssd", "census"], default="sad",
                   help="census is the exposure-robust production cost")
    s.add_argument("--lr-check", action="store_true", dest="lr_check",
                   help="flag occlusions via the left-right consistency "
                   "check (hierarchical backends: the in-kernel right-view "
                   "WTA; others switch via the cost volume)")
    s.add_argument(
        "--backend",
        choices=[
            "dense", "pallas", "hierarchical", "hierarchical-pallas",
            "hierarchical-sgm", "sgm", "sgm-pallas",
        ],
        default="dense",
    )
    s.set_defaults(fn=_cmd_stereo)

    f = sub.add_parser("foreground", help="README foreground-extraction flow")
    f.add_argument("main")
    f.add_argument("additional")
    f.add_argument("out")
    f.add_argument("--precision", type=int, default=36)
    f.set_defaults(fn=_cmd_foreground)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
