"""Footprint point clouds.

The reference rasterizes every agent by stamping a precomputed point cloud
sampled on a 0.01 m grid (agent.cpp:18-62).  Collision codes are read off the
occupancy grid at exactly those points, so to bit-match collision flags we
reproduce the same point sets.  They are generated host-side once per config
(static shapes), padded to a common count with a validity mask, and consumed
by vmapped JAX kernels.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import numpy as np

from img_env_tpu.constants import FOOTPRINT_RES


def circle_points(cx: float, cy: float, r: float) -> np.ndarray:
    """Grid points inside a circle — Agent::init_shape_circle (agent.cpp:18-30)."""
    res = FOOTPRINT_RES
    bb = int(math.ceil(r / res))
    m = np.arange(-bb, bb + 1, dtype=np.float64)
    mm, nn = np.meshgrid(m, m, indexing="ij")
    mask = np.sqrt((mm * res) ** 2 + (nn * res) ** 2) <= r
    pts = np.stack([mm[mask] * res + cx, nn[mask] * res + cy], axis=-1)
    return pts.astype(np.float32)


def ring_points(cx: float, cy: float, r: float) -> np.ndarray:
    """Annulus [r-0.01, r] — Agent::init_shape_beep (agent.cpp:33-48)."""
    res = FOOTPRINT_RES
    bb = int(math.ceil(r / res))
    m = np.arange(-bb, bb + 1, dtype=np.float64)
    mm, nn = np.meshgrid(m, m, indexing="ij")
    d = np.sqrt((mm * res) ** 2 + (nn * res) ** 2)
    mask = (d <= r) & (d >= r - 0.01)
    pts = np.stack([mm[mask] * res + cx, nn[mask] * res + cy], axis=-1)
    return pts.astype(np.float32)


def rectangle_points(x0: float, x1: float, y0: float, y1: float) -> np.ndarray:
    """Axis-aligned rectangle — Agent::init_shape_rectangle (agent.cpp:51-62)."""
    res = FOOTPRINT_RES
    xs = np.arange(int(math.floor(x0 / res)), int(math.ceil(x1 / res)) + 1)
    ys = np.arange(int(math.floor(y0 / res)), int(math.ceil(y1 / res)) + 1)
    mm, nn = np.meshgrid(xs.astype(np.float64), ys.astype(np.float64), indexing="ij")
    pts = np.stack([mm.ravel() * res, nn.ravel() * res], axis=-1)
    return pts.astype(np.float32)


def shape_points(shape: str, sizes: Sequence[float]) -> np.ndarray:
    """Body footprint for one agent in its base frame (Agent::init_shape)."""
    if shape == "circle":
        return circle_points(sizes[0], sizes[1], sizes[2])
    if shape == "rectangle":
        return rectangle_points(sizes[0], sizes[1], sizes[2], sizes[3])
    if shape == "leg":
        # Body cloud unused for legs in the world map; the legs are drawn
        # separately (PedAgent::draw_leg).  Per-leg clouds are circles at the
        # origin of the leg frame (agent.cpp:666-685).
        return circle_points(0.0, 0.0, sizes[2])
    raise ValueError(f"unknown shape {shape!r}")


class FootprintSet(NamedTuple):
    """Padded point clouds for a homogeneous group of agents.

    points: [A, P, 2] base-frame offsets; mask: [A, P] validity.
    """

    points: np.ndarray
    mask: np.ndarray

    @property
    def max_points(self) -> int:
        return self.points.shape[1]


def build_footprints(shapes: Sequence[str], sizes: Sequence[Sequence[float]]) -> FootprintSet:
    clouds = [shape_points(sh, sz) for sh, sz in zip(shapes, sizes)]
    pmax = max((c.shape[0] for c in clouds), default=1)
    pmax = max(pmax, 1)
    pts = np.zeros((len(clouds), pmax, 2), np.float32)
    msk = np.zeros((len(clouds), pmax), bool)
    for i, c in enumerate(clouds):
        pts[i, : c.shape[0]] = c
        msk[i, : c.shape[0]] = True
    return FootprintSet(points=pts, mask=msk)


def build_leg_footprints(
    shapes: Sequence[str], sizes: Sequence[Sequence[float]]
) -> Tuple[FootprintSet, FootprintSet]:
    """(left, right) leg clouds for ped groups (zero-size for non-leg shapes)."""
    left, right = [], []
    for sh, sz in zip(shapes, sizes):
        if sh == "leg":
            left.append(circle_points(0.0, 0.0, sz[2]))
            right.append(circle_points(0.0, 0.0, sz[5] if len(sz) > 5 else sz[2]))
        else:
            left.append(np.zeros((0, 2), np.float32))
            right.append(np.zeros((0, 2), np.float32))
    def _pad(clouds):
        pmax = max(max((c.shape[0] for c in clouds), default=1), 1)
        pts = np.zeros((len(clouds), pmax, 2), np.float32)
        msk = np.zeros((len(clouds), pmax), bool)
        for i, c in enumerate(clouds):
            pts[i, : c.shape[0]] = c
            msk[i, : c.shape[0]] = True
        return FootprintSet(points=pts, mask=msk)

    return _pad(left), _pad(right)


def bounding_radius(shape: str, sizes: Sequence[float]) -> float:
    """Module size used by the scenario sampler (reset_helper.py:14-27).

    Mirrors get_robot_radius including its permissiveness: 'L' and 'sweep'
    use the historical formulas, and any other unknown shape falls through
    to 0 (the reference initializes o = 0 and returns it unchanged)."""
    if shape == "circle":
        return float(sizes[2])
    if shape == "rectangle":
        return float(math.sqrt(sizes[0] ** 2 + sizes[2] ** 2))
    if shape == "leg":
        return float(sizes[-1] + sizes[-2])
    if shape == "L" and len(sizes) >= 4:
        return float(math.sqrt(sizes[1] ** 2 + sizes[3] ** 2))
    if shape == "sweep" and len(sizes) >= 4:
        return float(sizes[3] + sizes[1])
    return 0.0
