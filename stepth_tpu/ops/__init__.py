from stepth_tpu.ops import adjust, depth, kmeans, mask, photometric, resize

__all__ = ["adjust", "depth", "kmeans", "mask", "photometric", "resize"]
