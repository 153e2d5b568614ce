"""On-TPU compiled-vs-interpret kernel regression (VERDICT round-1 item 7).

The regular suite runs every Pallas kernel in interpret mode on CPU; this
module re-establishes on real hardware that the compiled Mosaic lowering is
bit-exact against the interpreter. It must escape conftest's CPU forcing, so
the check runs in a subprocess (tools/tpu_kernel_regression.py) with a clean
environment. Gated: STEPTH_TPU_TESTS=1 (needs the tunneled TPU, ~3 min of
compiles on a cold cache):

    STEPTH_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("STEPTH_TPU_TESTS") != "1",
    reason="on-TPU regression; set STEPTH_TPU_TESTS=1",
)

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "tpu_kernel_regression.py",
)


def test_compiled_equals_interpret_on_tpu():
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS",)}
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, _TOOL], capture_output=True, text=True, timeout=1800,
        env=env,
    )
    sys.stderr.write(proc.stdout + proc.stderr)
    assert proc.returncode == 0, proc.stdout + proc.stderr
