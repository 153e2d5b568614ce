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
  echo "=== done $(date -u +%FT%TZ) ==="
} >> /root/repo/tpu_measure.log 2>&1
