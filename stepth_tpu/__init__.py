"""stepth_tpu — a TPU-native stereo-depth and mapping engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
library nikilark/stepth (see SURVEY.md): depth-from-stereo block matching,
depth-map analytics and segmentation, mask algebra and masked adjustments, and
stereo photometric normalization — re-designed TPU-first as pure functions over
arrays with an exact NumPy oracle anchoring parity — plus the greenfield
extensions from BASELINE.md: dense pyramid cost-volume matching (Pallas), spatial
tile sharding with halo exchange, and multi-frame fusion with distributed bundle
adjustment.
"""

from stepth_tpu import config
from stepth_tpu.core.frame import MASK_FALSE, MASK_TRUE, DepthFrame, MaskFrame

__version__ = "0.1.0"

__all__ = [
    "DepthFrame",
    "MaskFrame",
    "MASK_TRUE",
    "MASK_FALSE",
    "config",
    "__version__",
]
