"""MPC: EDT correctness, planner sanity (goal progress, obstacle avoidance)."""

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.dynamics.limiter import LimiterParams
from img_env_tpu.config import SpeedLimiterConfig
from img_env_tpu.mpc.cost import CostWeights, WorldCost, static_distance
from img_env_tpu.mpc.edt import edt2d, edt2d_device
from img_env_tpu.mpc.mppi import MppiConfig, PlannerState, mppi_plan, cem_plan


def brute_edt(occ, res):
    h, w = occ.shape
    ys, xs = np.nonzero(occ)
    out = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            if occ[i, j]:
                continue
            out[i, j] = np.sqrt(((ys - i) ** 2 + (xs - j) ** 2).min())
    return out * res


def test_edt2d_exact(rng):
    occ = rng.random((24, 31)) < 0.1
    occ[0, 0] = True  # ensure non-empty
    got = edt2d(occ, 0.5)
    want = brute_edt(occ, 0.5)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_edt2d_device_matches_host(rng):
    occ = rng.random((20, 26)) < 0.08
    occ[3, 4] = True
    host = edt2d(occ, 0.1)
    dev = np.asarray(edt2d_device(jnp.asarray(occ), 0.1, clip_cells=32))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def _free_world(robot_radius=0.17):
    edt = jnp.full((80, 80), 100.0)
    return WorldCost(
        edt=edt, resolution=0.1,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=robot_radius,
    )


def _limiters():
    lv = LimiterParams.from_config(SpeedLimiterConfig(
        has_velocity_limits=True, min_velocity=0.0, max_velocity=0.6))
    lw = LimiterParams.from_config(SpeedLimiterConfig(
        has_velocity_limits=True, min_velocity=-0.9, max_velocity=0.9))
    return lv, lw


def test_static_distance_aabb():
    wc = WorldCost(
        edt=jnp.full((50, 50), 100.0), resolution=0.1,
        obs_aabb=jnp.asarray([[1.0, 1.0, 2.0, 2.0]]),
        obs_valid=jnp.ones((1,), bool), robot_radius=0.0,
    )
    d = static_distance(wc, jnp.asarray([3.0, 1.5]))
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)
    d_in = static_distance(wc, jnp.asarray([1.5, 1.5]))
    np.testing.assert_allclose(float(d_in), 0.0, atol=1e-5)


def test_mppi_progresses_toward_goal():
    wc = _free_world()
    lv, lw = _limiters()
    cfg = MppiConfig(horizon=8, samples=64)
    pose = jnp.asarray([2.0, 2.0, 0.0])
    goal = jnp.asarray([5.0, 2.0])
    ps = PlannerState(nominal=jnp.zeros((8, 2)))
    vw = jnp.zeros((2,))
    peds = jnp.zeros((0, 2))
    key = jax.random.PRNGKey(0)
    d0 = float(jnp.linalg.norm(goal - pose[:2]))
    for i in range(6):
        key, k = jax.random.split(key)
        act, ps, _ = mppi_plan(
            k, ps, pose, vw, vw, goal, wc, lv, lw,
            jnp.zeros((cfg.horizon, 0, 2)), jnp.zeros((0,)), cfg, CostWeights(), dt=0.4)
        from img_env_tpu.dynamics.kinematics import _exact_pose_update
        pose = _exact_pose_update(pose, act[0], act[1], 0.0, 0.4, False)
        vw = act
    d1 = float(jnp.linalg.norm(goal - pose[:2]))
    assert d1 < d0 - 0.8, (d0, d1)


def test_mppi_avoids_obstacle():
    """Wall of occupied cells between robot and goal: plans keep clearance."""
    occ = np.zeros((80, 80), bool)
    occ[:, 40] = True  # wall at x=4m
    occ[30:50, 40] = False  # gap y in [3,5]
    edt = edt2d(occ, 0.1)
    wc = WorldCost(
        edt=jnp.asarray(edt), resolution=0.1,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.17,
    )
    lv, lw = _limiters()
    cfg = MppiConfig(horizon=10, samples=256)
    pose = jnp.asarray([3.0, 4.0, 0.0])
    goal = jnp.asarray([6.0, 4.0])
    ps = PlannerState(nominal=jnp.zeros((10, 2)))
    vw = jnp.zeros((2,))
    peds = jnp.zeros((0, 2))
    key = jax.random.PRNGKey(1)
    from img_env_tpu.dynamics.kinematics import _exact_pose_update
    min_clear = np.inf
    for i in range(14):
        key, k = jax.random.split(key)
        act, ps, _ = mppi_plan(
            k, ps, pose, vw, vw, goal, wc, lv, lw,
            jnp.zeros((cfg.horizon, 0, 2)), jnp.zeros((0,)), cfg, CostWeights(), dt=0.4)
        pose = _exact_pose_update(pose, act[0], act[1], 0.0, 0.4, False)
        vw = act
        clear = float(static_distance(wc, pose[:2]))
        min_clear = min(min_clear, clear)
    assert min_clear > 0.17, min_clear  # never hit the wall
    # made it through the gap region or at least made progress
    assert float(jnp.linalg.norm(goal - pose[:2])) < 2.6


def test_cem_runs():
    wc = _free_world()
    lv, lw = _limiters()
    cfg = MppiConfig(horizon=6, samples=64, elites=8, cem_iters=2)
    ps = PlannerState(nominal=jnp.zeros((6, 2)))
    act, ps2, cost = cem_plan(
        jax.random.PRNGKey(0), ps, jnp.asarray([1.0, 1.0, 0.0]),
        jnp.zeros((2,)), jnp.zeros((2,)), jnp.asarray([3.0, 1.0]),
        wc, lv, lw, jnp.zeros((cfg.horizon, 0, 2)), jnp.zeros((0,)),
        cfg)
    assert act.shape == (2,)
    assert np.isfinite(float(cost))


def test_static_distance_orientation():
    """EDT lookups must follow the row=x / col=y map convention — checked
    on an ASYMMETRIC map (a wall only at high x), where a transposed
    lookup gives distances from the wrong axis (regression: the corridor
    scenario exposed exactly this)."""
    import jax.numpy as jnp
    import numpy as np

    from img_env_tpu.mpc.cost import WorldCost, static_distance, static_distance_smooth
    from img_env_tpu.mpc.edt import edt2d

    res = 0.1
    occ = np.zeros((40, 80), bool)     # x in [0,4), y in [0,8)
    occ[30:, :] = True                 # wall at x >= 3.0 only
    wc = WorldCost(
        edt=jnp.asarray(edt2d(occ, res), jnp.float32), resolution=res,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.0,
    )
    pts = jnp.asarray([[1.0, 6.0], [2.5, 1.0], [0.5, 4.0]])
    want = np.asarray([2.0, 0.5, 2.5])     # distance to the x=3 wall
    got = np.asarray(static_distance(wc, pts))
    np.testing.assert_allclose(got, want, atol=res)
    got_s = np.asarray(static_distance_smooth(wc, pts))
    np.testing.assert_allclose(got_s, want, atol=res)


def test_local_edt_patch_matches_gather(rng):
    """pool=1 patch select == the scalar-gather static_distance inside the
    reachable disc (up to the MXU bf16 operand pass; exact on CPU)."""
    from img_env_tpu.mpc.cost import local_edt_patch, static_distance_patch

    occ = rng.random((60, 72)) < 0.08
    occ[10, 12] = True
    res = 0.1
    wc = WorldCost(
        edt=jnp.asarray(edt2d(occ, res), jnp.float32), resolution=res,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.17)
    pose_xy = jnp.asarray([3.1, 4.2])
    reach = 1.2
    offs = jnp.asarray(rng.uniform(-reach, reach, (256, 2)), jnp.float32)
    xy = pose_xy[None] + offs
    ps = int(np.ceil(2 * (reach / res + 2) + 2))
    patch, corner = local_edt_patch(wc, pose_xy, ps)
    got = static_distance_patch(wc, patch, corner, xy)
    want = static_distance(wc, xy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_local_edt_patch_pooled_is_conservative(rng):
    """pool>1 reports the block min: <= the true cell value everywhere
    (clearance never over-reported), and within pool*res*sqrt2 of it."""
    from img_env_tpu.mpc.cost import local_edt_patch, static_distance_patch

    occ = rng.random((64, 64)) < 0.05
    occ[20, 20] = True
    res = 0.1
    wc = WorldCost(
        edt=jnp.asarray(edt2d(occ, res), jnp.float32), resolution=res,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.17)
    pose_xy = jnp.asarray([3.0, 3.0])
    offs = jnp.asarray(rng.uniform(-1.0, 1.0, (256, 2)), jnp.float32)
    xy = pose_xy[None] + offs
    pool = 4
    patch, corner = local_edt_patch(wc, pose_xy, 32, pool=pool)
    got = np.asarray(static_distance_patch(wc, patch, corner, xy, pool=pool))
    want = np.asarray(static_distance(wc, xy))
    assert (got <= want + 1e-6).all()
    # a pooled block spans pool cells; EDT is 1-Lipschitz in metric units
    assert (want - got <= pool * res * np.sqrt(2) + 1e-6).all()


def test_batched_mppi_avoid_k_prunes_to_nearest(rng):
    """avoid_k planners dodge a NEARBY robot exactly like all-pairs ones:
    far robots can only relax the clearance term, never change the min."""
    from img_env_tpu.mpc.mppi import batched_mppi

    occ = np.zeros((80, 80), bool)
    occ[0, :] = True
    res = 0.1
    wc = WorldCost(
        edt=jnp.asarray(edt2d(occ, res), jnp.float32), resolution=res,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.17)
    n, h = 6, 8
    poses = jnp.asarray(rng.uniform(1.5, 6.5, (n, 3)))
    goals = poses[:, :2] + 1.0
    lp = LimiterParams.from_config(SpeedLimiterConfig())
    cfg_all = MppiConfig(horizon=h, samples=64, avoid_k=0)
    cfg_k = cfg_all._replace(avoid_k=2)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    nom = jnp.zeros((n, h, 2))
    vw = jnp.zeros((n, 2))
    rt = jnp.broadcast_to(poses[None, :, :2], (h, n, 2))
    rr = jnp.full((n,), 0.17)
    args = (keys, nom, poses, vw, vw, goals, wc, lp, lp,
            jnp.zeros((h, 0, 2)), jnp.zeros((0,)))
    a_all, _, c_all = batched_mppi(*args, cfg_all, robot_traj=rt, robot_r=rr)
    a_k, _, c_k = batched_mppi(*args, cfg_k, robot_traj=rt, robot_r=rr)
    assert a_all.shape == a_k.shape == (n, 2)
    assert np.isfinite(np.asarray(c_all)).all()
    assert np.isfinite(np.asarray(c_k)).all()
