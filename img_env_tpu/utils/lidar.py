"""Laser -> image encodings (batched JAX port of envs/utils/lidar_process.py).

All functions take ``[..., R]`` range arrays (meters) and are shape-static and
jit/vmap friendly — the reference's per-beam Python loops become one
broadcasted comparison against the bin edges.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def down_sample(lidar, sample_num: int, is_circle: bool = False, max_range: float = 6.0):
    """Min-pool each consecutive ``sample_num`` beams, clip to max_range
    (lidar_process.py:20-32)."""
    if is_circle:
        lidar = lidar[..., 288:-288]
    n = lidar.shape[-1] // sample_num
    pooled = lidar[..., : n * sample_num].reshape(lidar.shape[:-1] + (n, sample_num))
    return jnp.minimum(pooled.min(-1), max_range)


def normal_sample(lidar, sample_num: int):
    """Strided subsample (lidar_process.py:35-40)."""
    n = lidar.shape[-1] // sample_num
    return lidar[..., : n * sample_num : sample_num]


def lidar_to_map(lidar, length: int, max_range: float = 6.0):
    """Linear occupancy strip per beam: 1 beyond-hit, 0 at-hit, 0.5 inside
    (lidar_process.py:43-59).  Returns [..., R, length]."""
    gap = max_range / length
    idx = np.arange(length)
    left = jnp.asarray(idx * gap)
    right = jnp.asarray((idx + 1) * gap)
    ld = lidar[..., None]
    return jnp.where(right <= ld, 1.0, jnp.where(left <= ld, 0.0, 0.5))


def lidar_log_map(lidar, length: int, max_range: float = 6.0):
    """Log-spaced strip (lidar_process.py:67-88): cells 0 beyond, 1 at hit,
    0.5 before.  Bin edges e^x-1 in log(max+1)/length steps."""
    max_dis = jnp.maximum(max_range, lidar.max())
    gap = jnp.log(max_dis + 1.0) / length
    idx = jnp.arange(length)
    e_left = jnp.exp(idx * gap) - 1.0
    e_right = jnp.minimum(jnp.exp((idx + 1) * gap) - 1.0, max_range)
    ld = lidar[..., None]
    return jnp.where(e_right <= ld, 0.0, jnp.where(e_left <= ld, 1.0, 0.5))


def lidar_e_map(lidar, length: int, max_range: float = 6.0):
    """Exp-spaced strip (lidar_process.py:91-109)."""
    gap = (math.e ** max_range - 1.0) / length
    idx = np.arange(length)
    e_left = jnp.asarray(np.log(idx * gap + 1.0))
    e_right = jnp.minimum(jnp.asarray(np.log((idx + 1) * gap + 1.0)), max_range)
    ld = lidar[..., None]
    return jnp.where(e_right <= ld, 0.0, jnp.where(e_left <= ld, 1.0, 0.5))


def polar_to_cartesian(strip, out_size: int, log_radius: bool = False):
    """Inverse-polar resampling of a [R, L] strip into a [out, out] image —
    the cv2.linearPolar/logPolar WARP_INVERSE_MAP step (lidar_process.py:
    112-124) as a gather with precomputed host-side indices."""
    r_bins, l_bins = strip.shape[-2], strip.shape[-1]
    c = out_size / 2.0
    ys, xs = np.mgrid[0:out_size, 0:out_size]
    dx, dy = xs - c, ys - c
    rho = np.hypot(dx, dy)
    phi = np.mod(np.arctan2(dy, dx), 2 * np.pi)
    max_radius = math.hypot(c, c)
    if log_radius:
        m = out_size / math.log(max_radius) * 0.99
        r_idx = np.clip((np.log(np.maximum(rho, 1e-6)) * m) * l_bins / out_size,
                        0, l_bins - 1).astype(np.int32)
    else:
        r_idx = np.clip(rho / (max_radius * 1.1) * l_bins, 0, l_bins - 1).astype(np.int32)
    a_idx = np.clip(phi / (2 * np.pi) * r_bins, 0, r_bins - 1).astype(np.int32)
    return strip[..., jnp.asarray(a_idx), jnp.asarray(r_idx)]


def trans_lidar_log_map(lasers, sample_num: int = 20, length: int = 48):
    """Full pipeline of _trans_lidar_log_map (lidar_process.py:8-16)."""
    strip = lidar_log_map(down_sample(lasers, sample_num), length)
    return polar_to_cartesian(strip, length, log_radius=False)
