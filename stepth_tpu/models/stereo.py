"""Model-level API: configured stereo depth estimators as frozen pytrees.

The reference's "model" is one hard-wired pipeline behind ``DepthImage``
(reference src/depth_image.rs:76-136). Here the matcher family is explicit —
pick a backend, hold its config, call it like a function. All backends share
the :class:`stepth_tpu.match.dense.MatchResult` contract.

Backends:
  * ``"dense"``              — pure-XLA cost volume (reference-quality, any platform)
  * ``"pallas"``             — fused TPU kernel (fastest exhaustive-search path)
  * ``"hierarchical"``       — coarse-to-fine pyramid, XLA (large search ranges)
  * ``"hierarchical-pallas"``— coarse-to-fine, all levels on Pallas kernels
  * ``"hierarchical-sgm"``   — coarse-to-fine with the SGM matcher at the
                               coarsest level (SGM-class robustness on
                               repetitive/low-texture scenes at near-flagship
                               speed: the coarse volume is 4^(levels−1)×
                               smaller than full-res SGM's)
  * ``"sgm"``                — semi-global matching (scanline-regularized WTA;
                               the accuracy backend for noisy/low-texture pairs)
  * ``"sgm-pallas"``         — the same SGM pipeline on fused TPU kernels
                               (~7× the XLA backend; identical outputs)
  * ``"parity"``             — the bit-exact reference-semantics path
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import numpy as np

from stepth_tpu.config import DEFAULT_PRECISION, MatchConfig, PyramidConfig
from stepth_tpu.match import dense
from stepth_tpu.match.sgm import SGMConfig


@dataclasses.dataclass(frozen=True)
class StereoModel:
    """A configured stereo depth estimator."""

    backend: str = "dense"
    match: MatchConfig = MatchConfig()
    pyramid: PyramidConfig = PyramidConfig()
    sgm: SGMConfig = SGMConfig()  # sgm / sgm-pallas / hierarchical-sgm only
    precision: Tuple[int, int, int] = DEFAULT_PRECISION  # parity backend only
    # hierarchical-pallas / hierarchical-sgm only: run the final refine
    # level's in-kernel right-view WTA and mark LR-inconsistent pixels
    # invalid (~1.2× the plain level's cost; occluded pixels get flagged
    # instead of silently carrying the foreground's disparity). The
    # non-pyramid backends take their LR switch from match.lr_threshold.
    lr_check: bool = False

    def __call__(self, left, right) -> dense.MatchResult:
        if self.backend == "dense":
            return dense.match_pair(left, right, self.match)
        if self.backend == "pallas":
            from stepth_tpu.match import pallas_dense

            return pallas_dense.match_pair_pallas(left, right, self.match)
        if self.backend == "hierarchical":
            from stepth_tpu.match import pyramid as pyr

            return pyr.match_hierarchical(left, right, self.match, self.pyramid)
        if self.backend == "hierarchical-pallas":
            from stepth_tpu.match import pallas_refine

            return pallas_refine.match_hierarchical_pallas(
                left, right, self.match, self.pyramid,
                lr_check=self.lr_check,
            )
        if self.backend == "hierarchical-sgm":
            from stepth_tpu.match import pallas_refine

            return pallas_refine.match_hierarchical_pallas(
                left, right, self.match, self.pyramid,
                coarse_backend="sgm", sgm=self.sgm,
                lr_check=self.lr_check,
            )
        if self.backend == "sgm":
            from stepth_tpu.match import sgm as sgm_mod

            return sgm_mod.match_pair_sgm(left, right, self.match, self.sgm)
        if self.backend == "sgm-pallas":
            from stepth_tpu.match import pallas_sgm

            return pallas_sgm.match_pair_sgm_pallas(
                left, right, self.match, self.sgm
            )
        if self.backend == "parity":
            from stepth_tpu.match import parity
            import jax.numpy as jnp

            depth = parity.depth_from_additional(
                np.asarray(left, dtype=np.uint8),
                np.asarray(right, dtype=np.uint8),
                self.precision,
            )
            d = jnp.asarray(depth).astype(jnp.float32)
            return dense.MatchResult(
                disparity=d, valid=jnp.ones(d.shape, bool), cost=jnp.zeros_like(d)
            )
        raise ValueError(f"unknown backend {self.backend!r}")

    def depth_u8(self, left, right) -> jax.Array:
        """Disparity scaled to the reference's u8 depth convention."""
        res = self(left, right)
        if self.backend == "parity":
            return res.disparity.astype("uint8")
        return dense.disparity_to_depth_u8(res.disparity, self.match.num_disparities)

    def batched(self):
        """One-dispatch batch path for multi-stream serving: a callable
        mapping stacked pairs ``[B,H,W]`` (or ``[B,H,W,3]``) to a stacked
        :class:`MatchResult`, rolled as ``lax.scan`` inside a single jit.

        Frames run device-sequentially — one 1080p frame already saturates
        the chip — but the whole batch costs ONE dispatch, so per-frame
        latency is the device throughput rather than throughput + host
        round-trip (1–3 ms over remote links). ``vmap`` is not an option
        here: the fused kernels use manual-DMA (`memory_space=ANY`) operands
        that Pallas cannot batch."""
        if self.backend == "parity":
            raise NotImplementedError("parity backend is host-side; loop it")

        def run(lefts, rights):
            def step(_, lr):
                return None, self(*lr)

            _, out = jax.lax.scan(step, None, (lefts, rights))
            return out

        return run

    def video(self, keyframe_interval: int = 8):
        """Temporally-seeded video path (hierarchical Pallas backends only):
        a callable mapping stacked clips ``[T,H,W]`` to a stacked
        :class:`MatchResult`. Non-keyframe frames skip the coarse pyramid and
        run only the full-resolution refine seeded by the previous frame's
        disparity (~1.17 vs 1.64 ms per 1080p frame — BASELINE.md round 4);
        every ``keyframe_interval``-th frame re-runs the full pyramid so
        fast motion and disocclusions self-correct. Use :meth:`batched` for
        independent (non-sequential) frames."""
        from stepth_tpu.match import pallas_refine

        if self.backend not in ("hierarchical-pallas", "hierarchical-sgm"):
            raise NotImplementedError(
                f"video() needs a hierarchical Pallas backend, got {self.backend!r}"
            )
        coarse = "sgm" if self.backend == "hierarchical-sgm" else "wta"
        return lambda lefts, rights: pallas_refine.match_temporal_pallas(
            lefts, rights, self.match, self.pyramid,
            keyframe_interval=keyframe_interval, lr_check=self.lr_check,
            coarse_backend=coarse, sgm=self.sgm,
        )

    def sharded(self, mesh):
        """Return a callable running this model row-tile-sharded over ``mesh``."""
        from stepth_tpu.parallel import sharded

        if self.backend == "dense":
            return lambda l, r: sharded.match_pair_sharded(l, r, self.match, mesh)
        if self.backend == "pallas":
            return lambda l, r: sharded.match_pair_sharded_pallas(
                l, r, self.match, mesh
            )
        if self.backend == "hierarchical-pallas":
            return lambda l, r: sharded.match_hierarchical_sharded(
                l, r, self.match, self.pyramid, mesh
            )
        if self.backend == "hierarchical-sgm":
            return lambda l, r: sharded.match_hierarchical_sharded(
                l, r, self.match, self.pyramid, mesh,
                coarse_backend="sgm", sgm=self.sgm,
            )
        if self.backend == "sgm":
            from stepth_tpu.parallel import sgm_sharded

            return lambda l, r: sgm_sharded.match_pair_sgm_sharded(
                l, r, self.match, self.sgm, mesh
            )
        if self.backend == "sgm-pallas":
            from stepth_tpu.parallel import sgm_pallas_sharded

            return lambda l, r, **kw: sgm_pallas_sharded.match_pair_sgm_pallas_sharded(
                l, r, self.match, self.sgm, mesh, **kw
            )
        raise NotImplementedError(f"sharded() unsupported for {self.backend}")


def flagship(num_disparities: int = 128) -> StereoModel:
    """The benchmark configuration: fused Pallas kernel, SAD, LR check."""
    return StereoModel(
        backend="pallas",
        match=MatchConfig(
            num_disparities=num_disparities, window=9, cost="sad", lr_threshold=1.0
        ),
    )
