"""Depth engines: the bit-exact parity pipeline (parity.py) and the dense
TPU fast path (dense.py, pyramid.py, pallas kernels)."""

from stepth_tpu.match import dense, parity, pyramid  # noqa: F401
