"""iLQR: smooth dynamics consistency + goal reaching + obstacle avoidance."""

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.mpc.cost import CostWeights, WorldCost
from img_env_tpu.mpc.edt import edt2d
from img_env_tpu.mpc.ilqr import IlqrConfig, ilqr_solve, smooth_step


def _free_world():
    return WorldCost(
        edt=jnp.full((100, 100), 100.0), resolution=0.1,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.17,
    )


def test_smooth_step_matches_exact_arc():
    from img_env_tpu.dynamics.kinematics import _exact_pose_update

    for v, w, th in [(0.5, 0.4, 0.3), (0.6, -0.9, -1.2), (0.3, 1e-9, 0.0),
                     (0.4, 0.0, 2.0)]:
        x = jnp.asarray([1.0, 2.0, th])
        got = smooth_step(x, jnp.asarray([v, w]), 0.4)
        want = _exact_pose_update(x, v, w, 0.0, 0.4, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-8)


def test_smooth_step_differentiable_at_zero_w():
    x = jnp.asarray([0.0, 0.0, 0.5])
    g = jax.jacfwd(lambda u: smooth_step(x, u, 0.4))(jnp.asarray([0.5, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ilqr_reaches_goal():
    wc = _free_world()
    cfg = IlqrConfig(horizon=20, iters=10)
    x0 = jnp.asarray([2.0, 2.0, 0.0])
    goal = jnp.asarray([5.0, 3.0])
    us0 = jnp.zeros((20, 2)).at[:, 0].set(0.3)
    peds = jnp.zeros((0, 2))
    us, xs, cost = jax.jit(
        lambda: ilqr_solve(x0, goal, us0, wc,
                           jnp.zeros((cfg.horizon, 0, 2)), jnp.zeros((0,)),
                           cfg, CostWeights(), dt=0.4))()
    # The plan must pass through the arrival radius (0.3 m): the sim latches
    # arrival there, and receding-horizon replanning discards the tail.
    d_min = float(jnp.linalg.norm(xs[:, :2] - goal, axis=-1).min())
    assert d_min < 0.3, d_min
    # respects bounds
    assert float(us[:, 0].min()) >= -1e-6 and float(us[:, 0].max()) <= 0.6 + 1e-6


def test_ilqr_avoids_wall():
    occ = np.zeros((100, 100), bool)
    occ[:, 50] = True
    occ[35:45, 50] = False  # gap at y in [3.5, 4.5]
    wc = WorldCost(
        edt=jnp.asarray(edt2d(occ, 0.1)), resolution=0.1,
        obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
        robot_radius=0.17,
    )
    cfg = IlqrConfig(horizon=24, iters=12)
    x0 = jnp.asarray([4.0, 4.0, 0.0])
    goal = jnp.asarray([6.5, 4.0])
    us0 = jnp.zeros((24, 2)).at[:, 0].set(0.4)
    peds = jnp.zeros((0, 2))
    us, xs, cost = ilqr_solve(x0, goal, us0, wc,
                              jnp.zeros((cfg.horizon, 0, 2)), jnp.zeros((0,)),
                              cfg, CostWeights(), dt=0.4)
    from img_env_tpu.mpc.cost import static_distance

    clear = np.asarray(jax.vmap(lambda p: static_distance(wc, p))(xs[:, :2]))
    assert clear.min() > 0.17, clear.min()  # trajectory never hits the wall


def test_ilqr_improves_cost_monotone_start_end():
    wc = _free_world()
    cfg = IlqrConfig(horizon=12, iters=6)
    x0 = jnp.asarray([1.0, 1.0, 1.5])
    goal = jnp.asarray([3.0, 1.0])
    us0 = jnp.zeros((12, 2))
    peds = jnp.zeros((0, 2))
    zt = jnp.zeros((12, 0, 2))
    _, xs0, _ = ilqr_solve(x0, goal, us0, wc, zt, jnp.zeros((0,)),
                           IlqrConfig(horizon=12, iters=0), CostWeights())
    _, xs1, _ = ilqr_solve(x0, goal, us0, wc, zt, jnp.zeros((0,)),
                           cfg, CostWeights())
    d0 = float(jnp.linalg.norm(xs0[-1, :2] - goal))
    d1 = float(jnp.linalg.norm(xs1[-1, :2] - goal))
    assert d1 < d0
