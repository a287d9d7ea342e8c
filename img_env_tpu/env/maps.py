"""Static map loading (host side, once per environment construction).

Replicates ``GridMap::read_image`` (grid_map.cpp:28-38): the PNG is read as
grayscale and resampled from its native ``global_resolution`` to the view
resolution with bilinear interpolation (cv2 default).  Row index corresponds
to world x, column index to world y (``world2map``: m = round(x/res),
n = round(y/res), grid_map.cpp:40-44).
"""

from __future__ import annotations

import functools

import numpy as np

from img_env_tpu.config import EnvConfig

try:  # cv2 gives bit-exact parity with the reference's resize
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAVE_CV2 = False


@functools.lru_cache(maxsize=32)
def _load_resized(path: str, global_res: float, view_res: float) -> np.ndarray:
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        h = int(img.shape[0] * global_res / view_res)
        w = int(img.shape[1] * global_res / view_res)
        out = cv2.resize(img, (w, h))  # INTER_LINEAR, like the reference
    else:  # pragma: no cover
        img = np.asarray(Image.open(path).convert("L"))
        h = int(img.shape[0] * global_res / view_res)
        w = int(img.shape[1] * global_res / view_res)
        out = np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))
    return np.ascontiguousarray(out, dtype=np.uint8)


def load_static_map(cfg: EnvConfig) -> np.ndarray:
    """uint8 [H, W] occupancy at ``view_map_resolution``."""
    return _load_resized(
        cfg.resolve_map_path(), float(cfg.global_resolution), float(cfg.view_map_resolution)
    )


def map_extent_m(static_map: np.ndarray, resolution: float) -> tuple:
    """(x_extent, y_extent) in meters."""
    return static_map.shape[0] * resolution, static_map.shape[1] * resolution
