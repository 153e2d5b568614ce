"""Model zoo: configured stereo estimators (dense / pallas / hierarchical /
parity backends)."""

from stepth_tpu.models.stereo import StereoModel, flagship  # noqa: F401
