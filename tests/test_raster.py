"""Layered-occupancy / collision-code parity against the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.ops.footprint import circle_points, rectangle_points
from img_env_tpu.ops import raster
from img_env_tpu.oracle.np_oracle import (
    OracleGrid,
    oracle_compose_scene,
    oracle_draw,
)

RES = 0.05
HW = (200, 200)  # 10 m x 10 m


def _static_map(rng):
    m = np.full(HW, 255, np.uint8)
    # border walls + a few random blocks, like a small room PNG
    m[:4, :] = 0
    m[-4:, :] = 0
    m[:, :4] = 0
    m[:, -4:] = 0
    for _ in range(5):
        x, y = rng.integers(20, 180, 2)
        m[x : x + rng.integers(3, 12), y : y + rng.integers(3, 12)] = 0
    # some intermediate gray cells (resize artifacts in real maps)
    for _ in range(30):
        x, y = rng.integers(10, 190, 2)
        m[x, y] = rng.integers(1, 250)
    return m


def _pad(clouds):
    pmax = max(max(c.shape[0] for c in clouds), 1)
    pts = np.zeros((len(clouds), pmax, 2), np.float32)
    msk = np.zeros((len(clouds), pmax), bool)
    for i, c in enumerate(clouds):
        pts[i, : c.shape[0]] = c
        msk[i, : c.shape[0]] = True
    return pts, msk


def test_obstacle_draw_parity(rng):
    static = _static_map(rng)
    o = 6
    poses = np.stack(
        [rng.uniform(1, 9, o), rng.uniform(1, 9, o), rng.uniform(-3.14, 3.14, o)], -1
    )
    clouds = []
    for k in range(o):
        if k % 2 == 0:
            clouds.append(circle_points(0, 0, rng.uniform(0.1, 0.4)))
        else:
            a, b = rng.uniform(0.05, 0.3, 2)
            clouds.append(rectangle_points(-a, a, -b, b))
    pts, msk = _pad(clouds)

    got = np.asarray(
        raster.draw_obstacles(jnp.asarray(static), RES, jnp.asarray(poses),
                              jnp.asarray(pts), jnp.asarray(msk))
    )

    grid = OracleGrid(static, RES)
    for k in range(o):
        oracle_draw(grid, poses[k], clouds[k], 0, "world_map")
    np.testing.assert_array_equal(got, grid.map)


def _random_scene(rng, n_rob=4, n_ped=3, n_obs=3, leg_peds=True):
    static = _static_map(rng)
    obs = []
    for k in range(n_obs):
        pose = np.array([rng.uniform(2, 8), rng.uniform(2, 8), rng.uniform(-3, 3)])
        obs.append((pose, circle_points(0, 0, rng.uniform(0.15, 0.35))))
    peds = []
    for k in range(n_ped):
        pose = np.array([rng.uniform(1.5, 8.5), rng.uniform(1.5, 8.5), rng.uniform(-3, 3)])
        if leg_peds and k % 2 == 0:
            lb = circle_points(0, 0, 0.1)
            rb = circle_points(0, 0, 0.1)
            loff = (rng.uniform(-0.15, 0.15), 0.1)
            roff = (rng.uniform(-0.15, 0.15), -0.1)
            peds.append((pose, "leg", (lb, rb, loff, roff)))
        else:
            peds.append((pose, "circle", circle_points(0, 0, 0.17)))
    robots = []
    for k in range(n_rob):
        # cluster some robots to trigger robot-robot collisions
        base = np.array([3.0, 3.0]) if k < 2 else rng.uniform(1.5, 8.5, 2)
        pose = np.array([
            base[0] + rng.uniform(-0.3, 0.3),
            base[1] + rng.uniform(-0.3, 0.3),
            rng.uniform(-3, 3),
        ])
        robots.append((pose, circle_points(0, 0, 0.17)))
    return static, obs, peds, robots


def _layers_from_scene(static, obs, peds, robots):
    obs_poses = np.stack([p for p, _ in obs]) if obs else np.zeros((0, 3))
    obs_pts, obs_msk = _pad([c for _, c in obs]) if obs else (np.zeros((0, 1, 2), np.float32), np.zeros((0, 1), bool))
    obs_map = raster.draw_obstacles(
        jnp.asarray(static), RES, jnp.asarray(obs_poses), jnp.asarray(obs_pts), jnp.asarray(obs_msk)
    )

    rob_poses = np.stack([p for p, _ in robots])
    rob_pts, rob_msk = _pad([c for _, c in robots])

    ped_poses = np.stack([p for p, _, _ in peds]) if peds else np.zeros((0, 3))
    body, lefts, rights = [], [], []
    for pose, kind, payload in peds:
        if kind == "circle":
            body.append(payload)
            lefts.append(np.zeros((0, 2), np.float32))
            rights.append(np.zeros((0, 2), np.float32))
        else:
            lb, rb, loff, roff = payload
            body.append(np.zeros((0, 2), np.float32))
            lefts.append(lb + np.asarray(loff, np.float32))
            rights.append(rb + np.asarray(roff, np.float32))
    if peds:
        pb, pbm = _pad(body)
        pl, plm = _pad(lefts)
        pr, prm = _pad(rights)
    else:
        pb = pl = pr = np.zeros((0, 1, 2), np.float32)
        pbm = plm = prm = np.zeros((0, 1), bool)

    layers = raster.build_layers(
        obs_map, RES,
        jnp.asarray(rob_poses), jnp.asarray(rob_pts), jnp.asarray(rob_msk),
        jnp.asarray(ped_poses), jnp.asarray(pb), jnp.asarray(pbm),
        jnp.asarray(pl), jnp.asarray(plm), jnp.asarray(pr), jnp.asarray(prm),
    )
    return layers


@pytest.mark.parametrize("trial", range(5))
def test_collision_codes_parity(rng, trial):
    static, obs, peds, robots = _random_scene(rng)
    layers = _layers_from_scene(static, obs, peds, robots)

    # oracle: compose layer maps then per-robot draw(-1) collision check
    obs_grid, peds_grid, robot_maps = oracle_compose_scene(static, RES, obs, peds, robots)
    want = []
    for i, (pose, bbox) in enumerate(robots):
        want.append(oracle_draw(robot_maps[i], pose, bbox, -1, "world_map"))

    n = len(robots)
    got = np.asarray(
        raster.collision_codes(
            layers,
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), bool),
        )
    )
    np.testing.assert_array_equal(got, np.array(want))


def test_collision_latching(rng):
    static, obs, peds, robots = _random_scene(rng)
    layers = _layers_from_scene(static, obs, peds, robots)
    n = len(robots)
    latched = np.zeros(n, np.int32)
    latched[0] = 2
    arr = np.zeros(n, bool)
    arr[1] = True
    got = np.asarray(
        raster.collision_codes(layers, jnp.asarray(latched), jnp.asarray(arr))
    )
    assert got[0] == 2          # latched collision survives
    assert got[1] == latched[1] # arrived robot keeps old (0) code


def test_obs_map_parity_in_layers(rng):
    """obs_map composed in layers equals the oracle's obstacle grid."""
    static, obs, peds, robots = _random_scene(rng)
    layers = _layers_from_scene(static, obs, peds, robots)
    obs_grid, _, _ = oracle_compose_scene(static, RES, obs, peds, robots)
    np.testing.assert_array_equal(np.asarray(layers.obs_map), obs_grid.map)


def test_ped_layer_matches_reference_cells(rng):
    """Cells reading as ped (value 1) match the oracle's composed map."""
    static, obs, peds, robots = _random_scene(rng, n_rob=1)
    layers = _layers_from_scene(static, obs, peds, robots)
    _, peds_grid, _ = oracle_compose_scene(static, RES, obs, peds, robots)
    is_ped, is_obs = raster.cell_categories(layers)
    np.testing.assert_array_equal(np.asarray(is_ped), peds_grid.map == 1)
    np.testing.assert_array_equal(np.asarray(is_obs), peds_grid.map == 0)
