"""Pallas matmul fill kernel vs the XLA gather fill (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.ops import polar, raster
from img_env_tpu.ops.pallas_fill import (
    _block_dims,
    fill_sorted_pallas,
    fill_values_pallas,
    prepare_map,
)
from img_env_tpu.ops.view import ViewParams

from tests.test_raster import RES, _layers_from_scene, _random_scene

VP = ViewParams(
    hpx=64, wpx=64, resolution=RES, half=1.6,
    angle_begin=-1.570795, angle_end=1.570795,
    min_dist=0.0, max_dist=10.0, range_total=32, use_laser=True,
)


def test_window_diameter_bound():
    """(chunk, angle) ordering keeps every 128-slot window small.

    What matters is the fill-kernel block size: the span in map cells must
    stay far below the view extent (64 px here) or the one-hot matmuls
    stop paying off.
    """
    ps = polar.PolarStatics.build(VP, n_chunks=8)
    assert ps.max_window_diam / RES < 2 * ps.fill_window / 8


def test_fill_sorted_pallas_matches_gather_path(rng):
    ps = polar.PolarStatics.build(VP, n_chunks=8)
    static, obs, peds, robots = _random_scene(rng, n_rob=3, n_ped=2, n_obs=2)
    layers = _layers_from_scene(static, obs, peds, robots)
    poses = jnp.asarray(np.stack([p for p, _ in robots]), jnp.float32)

    # the Pallas path returns GATED occupancy (ungated windows are skipped)
    want = (np.asarray(polar.fill_sorted(ps, layers.packed, RES, poses))
            & np.asarray(ps.gates_sorted)[None])
    got = np.asarray(fill_sorted_pallas(
        ps, layers.packed, RES, poses, interpret=True))
    # x64 CPU reference vs f32 kernel: allow only boundary-rounding slips
    mism = (got != want).mean()
    assert mism < 2e-3, f"mismatch fraction {mism}"


def test_fill_kernel_robot_id_exclusion(rng):
    """Self-exclusion semantics: each robot sees others, never itself."""
    ps = polar.PolarStatics.build(VP, n_chunks=8)
    bm, bn, n_copies = _block_dims(ps, RES)
    h = w = 220
    # two robots stamped by hand into an otherwise empty map
    packed = np.zeros((h, w), np.int64)
    spots = [(60, 60), (61, 62)]
    for rid, (m, n) in enumerate(spots, start=1):
        packed[m, n] = (1 << 1) | (rid << 3)      # count 1, id rid, no static
    big = prepare_map(jnp.asarray(packed, jnp.int32), bm, bn)
    # both robots placed so both stamps are in view
    poses = jnp.asarray([[60 * RES, 60 * RES, 0.0],
                         [61 * RES, 62 * RES, 1.0]], jnp.float32)
    bx = jnp.asarray(ps.pix_x_sorted, jnp.float32)
    by = jnp.asarray(ps.pix_y_sorted, jnp.float32)
    occ = np.asarray(fill_values_pallas(
        big, poses, bx, by,
        res=RES, fw=int(ps.fill_window), bm=bm, bn=bn, n_copies=n_copies,
        interpret=True))

    def slot_of_world_cell(pose, m, n):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        wx = np.asarray(bx) * c - np.asarray(by) * s + pose[0]
        wy = np.asarray(bx) * s + np.asarray(by) * c + pose[1]
        cm = np.round(wx / RES).astype(int)
        cn = np.round(wy / RES).astype(int)
        return np.nonzero((cm == m) & (cn == n))[0]

    gates = np.asarray(ps.gates_sorted)
    checked = 0
    for i, pose in enumerate(np.asarray(poses)):
        for rid, (m, n) in enumerate(spots, start=1):
            slots = slot_of_world_cell(pose, m, n)
            slots = slots[gates[slots]]     # the fill only covers in-FOV slots
            if slots.size == 0:
                continue
            if rid == i + 1:
                assert not occ[i, slots].any(), "robot sees itself"
            else:
                assert occ[i, slots].all(), "robot misses the other robot"
                checked += 1
    assert checked, "no in-FOV cross-robot visibility exercised"


def test_fill_single_copy_path(rng):
    """Coarse-pixel views (span > 96 map cells) use the wide-block
    single-copy kernel path — exercise it in interpret mode."""
    vp = VP._replace(hpx=64, wpx=64, resolution=3 * RES, half=4.8)
    # many thin radial bands -> long window arcs -> big span at map res
    ps = polar.PolarStatics.build(vp, n_chunks=16)
    bm, bn, n_copies = _block_dims(ps, RES)   # map at RES, pixels at 3*RES
    assert n_copies == 1 and bn > 128, "expected the wide-block fallback"

    h = w = 320
    world = rng.integers(0, 2, (h, w)).astype(np.int64)
    packed = (world & 1)                      # static occupancy only
    big = prepare_map(jnp.asarray(packed, jnp.int32), bm, bn)
    poses = jnp.asarray(
        np.column_stack([rng.uniform(5.0, 9.0, 2), rng.uniform(5.0, 9.0, 2),
                         rng.uniform(-3.1, 3.1, 2)]), jnp.float32)
    bx = jnp.asarray(ps.pix_x_sorted, jnp.float32)
    by = jnp.asarray(ps.pix_y_sorted, jnp.float32)
    occ = np.asarray(fill_values_pallas(
        big, poses, bx, by,
        res=RES, fw=int(ps.fill_window), bm=bm, bn=bn, n_copies=n_copies,
        interpret=True))

    gates = np.asarray(ps.gates_sorted)
    for i, pose in enumerate(np.asarray(poses)):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        wx = np.asarray(bx) * c - np.asarray(by) * s + pose[0]
        wy = np.asarray(bx) * s + np.asarray(by) * c + pose[1]
        cm = np.round(wx / RES).astype(int)
        cn = np.round(wy / RES).astype(int)
        inside = (cm >= 0) & (cm < h) & (cn >= 0) & (cn < w)
        want = np.zeros_like(inside)
        want[inside] = packed[cm[inside], cn[inside]] > 0
        sel = inside & gates
        np.testing.assert_array_equal(occ[i][sel] > 0, want[sel])


@pytest.mark.parametrize("corner", [(0.1, 0.1), (0.1, 9.9), (9.9, 0.1),
                                    (9.9, 9.9)])
def test_fill_at_map_corners(rng, corner):
    """Block-corner clamping: robots at map edges still match the gather
    path exactly (windows partially off-map exercise every clip branch)."""
    ps = polar.PolarStatics.build(VP, n_chunks=8)
    static, obs, peds, robots = _random_scene(rng, n_rob=2, n_ped=0, n_obs=2)
    layers = _layers_from_scene(static, obs, peds, robots)
    poses = jnp.asarray([[corner[0], corner[1], rng.uniform(-3.1, 3.1)],
                         [corner[0] + 0.3, corner[1], 1.0]], jnp.float32)

    want = (np.asarray(polar.fill_sorted(ps, layers.packed, RES, poses))
            & np.asarray(ps.gates_sorted)[None])
    got = np.asarray(fill_sorted_pallas(
        ps, layers.packed, RES, poses, interpret=True))
    mism = (got != want).mean()
    assert mism < 2e-3, f"corner {corner}: mismatch {mism}"
