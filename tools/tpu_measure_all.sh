#!/bin/bash
# Full TPU measurement sequence (cold-cache safe; ~30-60 min first run,
# fast after .jax_cache warms). Appends to /root/repo/tpu_measure.log.
# Run when the tunnel is healthy: bash tools/tpu_measure_all.sh
cd /root/repo || exit 1
{
  echo "=== tpu_measure_all $(date -u +%FT%TZ) ==="
  echo "--- headline ---"
  timeout 3000 python bench.py
  echo "--- extra (VGA / SGM / hybrid / native baselines / video / BA) ---"
  timeout 3600 python bench.py --extra
  echo "--- SGM per-stage profile (f32 vs bf16) ---"
  timeout 2400 python bench.py --profile-sgm
  echo "--- flagship per-stage profile ---"
  timeout 2400 python bench.py --profile
  echo "--- on-TPU kernel regression (compiled == interpret) ---"
  STEPTH_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_kernels.py -q
  echo "--- refine-windows frontier (round 4) ---"
  timeout 3000 python tools/refine_frontier.py
  echo "--- per-backend accuracy, vga + 1080p (round 4) ---"
  timeout 3000 python tools/accuracy_eval.py --size vga
  timeout 3600 python tools/accuracy_eval.py --size 1080p --backends pallas,hierarchical-pallas,hierarchical-sgm,sgm
  echo "--- BA convergence + production timing (round 4) ---"
  timeout 2400 python tools/ba_convergence.py
  echo "--- H2D transport floor (round 4) ---"
  timeout 600 python tools/transport_bench.py
  echo "--- SGM warmup accuracy curve (round 5) ---"
  timeout 2400 python tools/sgm_warmup_curve.py
  echo "--- config-5 mapping at production scale (round 5) ---"
  timeout 2400 python tools/mapping_bench.py --size 1080p
  echo "--- on-TPU kernel regression incl. round-5 kernels ---"
  timeout 2400 python tools/tpu_kernel_regression.py
  echo "--- photo-textured accuracy tables (round 5) ---"
  timeout 3000 python tools/accuracy_eval.py --size vga --texture photo --jpeg 87
  timeout 3000 python tools/accuracy_eval.py --size vga --texture photo --jpeg 87 --cost census --backends pallas,hierarchical-pallas,hierarchical-sgm,sgm
  echo "=== done $(date -u +%FT%TZ) ==="
} >> /root/repo/tpu_measure.log 2>&1
