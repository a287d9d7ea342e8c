"""Native C++ oracle vs the NumPy oracle: bit-exact on every surface."""

import numpy as np
import pytest

from img_env_tpu.oracle import cpp_oracle
from img_env_tpu.oracle.np_oracle import (
    OracleGrid,
    oracle_bresenham,
    oracle_cmd,
    oracle_draw,
    oracle_view,
)
from img_env_tpu.ops.footprint import circle_points

pytestmark = pytest.mark.skipif(
    not cpp_oracle.available(), reason="g++ toolchain unavailable")

RES = 0.05


def scene(rng, h=80, w=80):
    grid = np.full((h, w), 255, np.uint8)
    for _ in range(6):
        m, n = rng.integers(5, h - 5), rng.integers(5, w - 5)
        grid[m - 2:m + 2, n - 2:n + 2] = rng.choice([0, 1, 2])
    return grid


def test_draw_parity(rng):
    grid_np = scene(rng)
    grid_cc = grid_np.copy()
    pose = np.asarray([2.0, 2.0, 0.7])
    pts = circle_points(0.0, 0.0, 0.17)
    g = OracleGrid(grid_np, RES)
    code_np = oracle_draw(g, pose, pts, 2, "world_map")
    code_cc = cpp_oracle.draw(grid_cc, RES, pose, pts, 2)
    assert code_np == code_cc
    np.testing.assert_array_equal(g.map, grid_cc)


@pytest.mark.parametrize("omni", [0, 1])
def test_cmd_parity(rng, omni):
    from img_env_tpu.oracle.np_oracle import OracleLimiter

    lv = OracleLimiter(True, True, False, 0.0, 0.6, -2.0, 2.0)
    lw = OracleLimiter(True, True, False, -0.9, 0.9, -2.0, 2.0)
    lim_v = np.asarray([1, 1, 0.0, 0.6, -2.0, 2.0], np.float64)
    lim_w = np.asarray([1, 1, -0.9, 0.9, -2.0, 2.0], np.float64)
    pose = np.asarray([1.0, 1.0, 0.3])
    goal = np.asarray([1.8, 1.2])
    last0 = np.zeros(2)
    last1 = np.zeros(2)
    ktype = "omni" if omni else "diff"
    for step in range(6):
        v, w, vy = rng.uniform(0, 0.6), rng.uniform(-0.9, 0.9), rng.uniform(-0.2, 0.2)
        w_pose, w_l0, w_l1, w_vel, w_arr = oracle_cmd(
            pose.copy(), goal, v, w, vy, last0.copy(), last1.copy(),
            lv, lw, 0.4, ktype)
        got_pose, got_l0, got_l1, got_vel, got_arr = cpp_oracle.cmd(
            pose.copy(), goal, last0.copy(), last1.copy(),
            v, w, vy, 0.4, omni, lim_v, lim_w)
        np.testing.assert_allclose(got_pose, w_pose, atol=1e-12)
        np.testing.assert_allclose(got_vel, np.asarray(w_vel), atol=1e-12)
        assert got_arr == bool(w_arr)
        pose, last0, last1 = got_pose, got_l0, got_l1


def test_view_laser_parity(rng):
    grid = scene(rng)
    pose = np.asarray([2.0, 2.0, 0.9])
    bbox = circle_points(0.0, 0.0, 0.17)
    hpx = wpx = 60
    want = oracle_view(
        OracleGrid(grid.copy(), RES), pose, np.zeros((0, 2)),
        view_size_m=(hpx * RES, wpx * RES), view_resolution=RES,
        range_total=90, use_laser=True,
    )
    got_view, got_hits, got_ang = cpp_oracle.view(
        grid, RES, pose, hpx, wpx, RES, hpx * RES / 2,
        -1.570795, 1.570795, 0.0, 10.0, 90, True)
    np.testing.assert_allclose(got_hits, want.hits, atol=1e-12)
    np.testing.assert_allclose(got_ang, want.angular_map, atol=1e-12)
    np.testing.assert_array_equal(got_view, want.view_map)


def test_view_no_laser_parity(rng):
    grid = scene(rng)
    pose = np.asarray([1.5, 2.5, -0.4])
    hpx = wpx = 40
    want = oracle_view(
        OracleGrid(grid.copy(), RES), pose, np.zeros((0, 2)),
        view_size_m=(hpx * RES, wpx * RES), view_resolution=RES,
        range_total=30, use_laser=False,
    )
    got_view, _, _ = cpp_oracle.view(
        grid, RES, pose, hpx, wpx, RES, hpx * RES / 2,
        -1.570795, 1.570795, 0.0, 10.0, 30, False)
    np.testing.assert_array_equal(got_view, want.view_map)


def test_bench_step_runs(rng):
    grid = np.full((200, 200), 255, np.uint8)
    n = 4
    poses = rng.uniform(2, 8, size=(n, 3))
    goals = rng.uniform(2, 8, size=(n, 2))
    pts = circle_points(0.0, 0.0, 0.17)
    t = cpp_oracle.bench_step(grid, RES, poses, goals, pts, 100, 100, 90, iters=2)
    assert t > 0
