"""Image I/O at the array boundary.

PIL decodes/encodes at the edge; everything inside the framework is a NumPy/JAX
array (RGB u8[H,W,3], RGBA u8[H,W,4], luma u8[H,W]). Mirrors the reference's use of
image-rs open/save (reference src/depth_image.rs:13-21, src/mask_image.rs:197-199).
"""

from __future__ import annotations

import os

import numpy as np

try:  # PIL is the edge decoder; arrays everywhere else.
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:  # pragma: no cover - PIL is baked into the image
    _HAS_PIL = False


class ImageIOError(ValueError):
    """Raised on decode/size failures (reference returns io::Error InvalidInput,
    src/depth_image.rs:45-48,68-71)."""


def _require_pil() -> None:
    if not _HAS_PIL:  # pragma: no cover
        raise ImageIOError("PIL is unavailable; install pillow for image I/O")


def open_rgba(path: str | os.PathLike) -> np.ndarray:
    """Decode to RGBA u8[H,W,4] (reference ``to_rgba8``, src/depth_image.rs:18)."""
    _require_pil()
    try:
        with _PILImage.open(path) as im:
            return np.asarray(im.convert("RGBA"), dtype=np.uint8)
    except (OSError, ValueError) as e:
        raise ImageIOError(f"Failed to open image: {path}") from e


def open_rgb(path: str | os.PathLike) -> np.ndarray:
    """Decode to RGB u8[H,W,3] (reference ``to_rgb8``, src/depth_image.rs:96)."""
    _require_pil()
    try:
        with _PILImage.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except (OSError, ValueError) as e:
        raise ImageIOError(f"Failed to open image: {path}") from e


def open_luma(path: str | os.PathLike) -> np.ndarray:
    """Decode to luma u8[H,W] via Rec.709 weighting (docs/SEMANTICS.md §2).

    The reference's ``to_luma8`` uses image-rs' SRGB_LUMA = (0.2126, 0.7152, 0.0722)
    with truncating cast; PIL's ``convert("L")`` uses Rec.601, so we convert from RGB
    explicitly for parity.
    """
    _require_pil()
    try:
        with _PILImage.open(path) as im:
            if im.mode in ("L", "I;16", "I"):
                arr = np.asarray(im.convert("L"), dtype=np.uint8)
                return arr
            rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    except (OSError, ValueError) as e:
        raise ImageIOError(f"Failed to open image: {path}") from e
    return rgb_to_luma(rgb)


def rgb_to_luma(rgb: np.ndarray) -> np.ndarray:
    """image-rs 0.23 luma: trunc(0.2126 r + 0.7152 g + 0.0722 b) in f32."""
    rgb = np.asarray(rgb)
    w = np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)
    l = (rgb[..., :3].astype(np.float32) * w).sum(axis=-1)
    return l.astype(np.uint8)


def rgba_to_rgb(rgba: np.ndarray) -> np.ndarray:
    """Drop alpha (image-rs ``to_rgb8`` from RGBA ignores alpha)."""
    return np.ascontiguousarray(np.asarray(rgba)[..., :3])


def rgb_to_rgba(rgb: np.ndarray) -> np.ndarray:
    """Append opaque alpha."""
    rgb = np.asarray(rgb)
    alpha = np.full(rgb.shape[:-1] + (1,), 255, dtype=np.uint8)
    return np.concatenate([rgb, alpha], axis=-1)


def save(path: str | os.PathLike, array) -> None:
    """Encode u8 array (HW -> L, HW3 -> RGB, HW4 -> RGBA; RGBA saved as RGB for
    JPEG targets, matching image-rs' JPEG encoder behavior)."""
    _require_pil()
    arr = np.asarray(array, dtype=np.uint8)
    if arr.ndim == 2:
        im = _PILImage.fromarray(arr, mode="L")
    elif arr.ndim == 3 and arr.shape[-1] == 3:
        im = _PILImage.fromarray(arr, mode="RGB")
    elif arr.ndim == 3 and arr.shape[-1] == 4:
        im = _PILImage.fromarray(arr, mode="RGBA")
    else:
        raise ImageIOError(f"Unsupported array shape for save: {arr.shape}")
    ext = os.path.splitext(str(path))[1].lower()
    if ext in (".jpg", ".jpeg") and im.mode == "RGBA":
        im = im.convert("RGB")
    im.save(path)


def save_ply(path, points, colors=None, valid=None) -> int:
    """Write a point cloud to binary little-endian PLY.

    ``points``: [..., 3] (any leading shape; flattened). ``colors``: optional
    [..., 3] u8 (or float 0-255). ``valid``: optional boolean mask over the
    leading shape — invalid and non-finite points are dropped. Returns the
    number of points written. Host-side (NumPy at the edge, like the image
    I/O in this module)."""
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    keep = np.isfinite(pts).all(axis=1)
    if valid is not None:
        keep &= np.asarray(valid, dtype=bool).reshape(-1)
    col = None
    if colors is not None:
        col = np.asarray(colors).reshape(-1, 3)
        if col.dtype != np.uint8:
            col = np.clip(col, 0, 255).astype(np.uint8)
        col = col[keep]
    pts = pts[keep]
    n = int(pts.shape[0])
    header = [
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if col is not None:
        header += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    header.append("end_header")
    if col is not None:
        rec = np.zeros(
            n,
            dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
        )
        rec["xyz"] = pts.astype("<f4")
        rec["rgb"] = col
        body = rec.tobytes()
    else:
        body = pts.astype("<f4").tobytes()
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(body)
    return n
