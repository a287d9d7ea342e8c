"""ctypes bridge to the native C++ oracle (cpp/oracle.cpp).

Builds liboracle.so on demand with g++ -O3 (cached next to the source).  The
native oracle is the ground truth for bit-match parity tests and supplies the
CPU per-step latency baseline (BASELINE.md protocol step 2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "oracle.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "liboracle.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Optional[str]:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return None
    if force or not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            return None
    return lib


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    lib = build()
    if lib is None:
        return None
    L = ctypes.CDLL(lib)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f8p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    d = ctypes.c_double

    L.oracle_draw.restype = c
    L.oracle_draw.argtypes = [u8p, c, c, d, f8p, f8p, c, c]
    L.oracle_cmd.restype = c
    L.oracle_cmd.argtypes = [f8p, f8p, f8p, f8p, d, d, d, d, c, f8p, f8p, f8p]
    L.oracle_view.restype = None
    L.oracle_view.argtypes = [u8p, c, c, d, f8p, c, c, d, d, d, d, d, d, c, c,
                              d, d, u8p, f8p, f8p]
    L.oracle_bench_step.restype = d
    L.oracle_bench_step.argtypes = [u8p, c, c, d, f8p, f8p, f8p, c, c, c, c,
                                    c, c]
    _lib = L
    return L


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# numpy-friendly wrappers
# ---------------------------------------------------------------------------


def draw(grid: np.ndarray, res: float, pose, pts, value: int) -> int:
    L = load()
    pose = np.ascontiguousarray(pose, np.float64)
    pts = np.ascontiguousarray(pts, np.float64)
    return L.oracle_draw(grid, grid.shape[0], grid.shape[1], res, pose,
                         pts, pts.shape[0], value)


def cmd(pose, goal, last0, last1, v, w, v_y, dt, omni, lim_v, lim_w):
    L = load()
    pose = np.ascontiguousarray(pose, np.float64)
    goal = np.ascontiguousarray(goal, np.float64)
    last0 = np.ascontiguousarray(last0, np.float64)
    last1 = np.ascontiguousarray(last1, np.float64)
    lim_v = np.ascontiguousarray(lim_v, np.float64)
    lim_w = np.ascontiguousarray(lim_w, np.float64)
    vel = np.zeros(2, np.float64)
    arrive = L.oracle_cmd(pose, goal, last0, last1, float(v), float(w),
                          float(v_y), float(dt), int(omni), lim_v, lim_w, vel)
    return pose, last0, last1, vel, bool(arrive)


def view(world: np.ndarray, wres: float, pose, hpx: int, wpx: int,
         vres: float, half: float, angle_begin: float, angle_end: float,
         min_dist: float, max_dist: float, range_total: int,
         use_laser: bool = True, sensor=(0.0, 0.0)):
    L = load()
    pose = np.ascontiguousarray(pose, np.float64)
    out = np.zeros((hpx, wpx), np.uint8)
    hits = np.zeros(range_total, np.float64)
    angular = np.zeros(72, np.float64)
    L.oracle_view(np.ascontiguousarray(world, np.uint8), world.shape[0],
                  world.shape[1], wres, pose, hpx, wpx, vres, half,
                  angle_begin, angle_end, min_dist, max_dist, range_total,
                  int(use_laser), float(sensor[0]), float(sensor[1]),
                  out, hits, angular)
    return out, hits, angular


def bench_step(base_map: np.ndarray, res: float, poses, goals, robot_pts,
               hpx: int, wpx: int, range_total: int, iters: int = 5) -> float:
    """Mean seconds per full N-robot step (raster + view + laser)."""
    L = load()
    poses = np.ascontiguousarray(poses, np.float64)
    goals = np.ascontiguousarray(goals, np.float64)
    pts = np.ascontiguousarray(robot_pts, np.float64)
    return L.oracle_bench_step(
        np.ascontiguousarray(base_map, np.uint8), base_map.shape[0],
        base_map.shape[1], res, poses, goals, pts, pts.shape[0],
        poses.shape[0], hpx, wpx, range_total, iters)
