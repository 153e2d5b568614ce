from stepth_tpu.core import io
from stepth_tpu.core.frame import MASK_FALSE, MASK_TRUE, DepthFrame, MaskFrame

__all__ = ["io", "DepthFrame", "MaskFrame", "MASK_TRUE", "MASK_FALSE"]
