"""Kinematics + speed-limiter parity against the NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import SpeedLimiterConfig
from img_env_tpu.dynamics.kinematics import robot_cmd
from img_env_tpu.dynamics.limiter import LimiterParams, limit_command
from img_env_tpu.oracle.np_oracle import OracleLimiter, oracle_cmd


def _mk_limiters(has_v=False, has_a=False, has_j=False):
    cfg = SpeedLimiterConfig(
        has_velocity_limits=has_v,
        has_acceleration_limits=has_a,
        has_jerk_limits=has_j,
        min_velocity=0.0,
        max_velocity=0.6,
        min_acceleration=-1.6,
        max_acceleration=5.0,
        min_jerk=-3.0,
        max_jerk=3.0,
    )
    oc = OracleLimiter(
        has_velocity_limits=has_v,
        has_acceleration_limits=has_a,
        has_jerk_limits=has_j,
        min_velocity=0.0,
        max_velocity=0.6,
        min_acceleration=-1.6,
        max_acceleration=5.0,
        min_jerk=-3.0,
        max_jerk=3.0,
    )
    return LimiterParams.from_config(cfg, dtype=jnp.float64), oc


@pytest.mark.parametrize("has_v,has_a,has_j", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (True, True, False),
    (True, True, True),
])
def test_limiter_parity(rng, has_v, has_a, has_j):
    jp, oc = _mk_limiters(has_v, has_a, has_j)
    trials = rng.uniform(-2, 2, (300, 3))
    dt = 0.4
    got = np.asarray(
        limit_command(jp, jnp.asarray(trials[:, 0]), jnp.asarray(trials[:, 1]),
                      jnp.asarray(trials[:, 2]), dt)
    )
    want = np.array([oc.limit(v, v0, v1, dt) for v, v0, v1 in trials])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_limiter_zero_edge_cases():
    jp, oc = _mk_limiters(True, True, False)
    for v, v0, v1 in [(0.0, 0.0, 0.0), (0.5, -0.5, 0.0), (-0.5, 0.5, 0.1), (0.0, 0.3, 0.0)]:
        got = float(limit_command(jp, jnp.float64(v), jnp.float64(v0), jnp.float64(v1), 0.4))
        want = oc.limit(v, v0, v1, 0.4)
        assert got == pytest.approx(want, abs=1e-12)


@pytest.mark.parametrize("ktype", ["diff", "omni"])
@pytest.mark.parametrize("dt", [0.4, 0.1])
def test_cmd_parity(rng, ktype, dt):
    import jax

    jp, oc = _mk_limiters(True, True, False)
    n_sub = 0
    cur = 0.0
    while cur <= dt:
        n_sub += 1
        cur += 0.05

    t = 64
    poses = rng.uniform(0, 10, (t, 3))
    poses[:, 2] = rng.uniform(-np.pi, np.pi, t)
    goals = rng.uniform(0, 10, (t, 2))
    last0 = rng.uniform(-0.5, 0.5, (t, 2))
    last1 = rng.uniform(-0.5, 0.5, (t, 2))
    vs = rng.uniform(0, 0.6, t)
    ws = rng.uniform(-0.9, 0.9, t)
    ws[::7] = 0.0  # exercise the straight-line branch exactly
    vys = rng.uniform(-0.3, 0.3, t)

    run = jax.jit(jax.vmap(
        lambda p, g, l0, l1, v, w, vy: robot_cmd(
            p, g, l0, l1, v, w, vy, jp, jp, dt, n_sub, ktype
        )
    ))
    res = run(*(jnp.asarray(a) for a in (poses, goals, last0, last1, vs, ws, vys)))

    for i in range(t):
        o_pose, o_l0, o_l1, (ovx, ovy), o_arr = oracle_cmd(
            poses[i], goals[i], vs[i], ws[i], vys[i],
            last0[i].copy(), last1[i].copy(), oc, oc, dt, ktype,
        )
        np.testing.assert_allclose(np.asarray(res.pose[i]), o_pose, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res.vw_last0[i]), o_l0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.vw_last1[i]), o_l1, atol=1e-12)
        np.testing.assert_allclose(np.asarray(res.vel_world[i]), [ovx, ovy], atol=1e-12)
        assert bool(res.arrive[i]) == o_arr, i


def test_cmd_midstep_arrival():
    """A robot passing through its goal mid-step must flag arrival even if the
    final pose is outside the radius (agent.cpp:201-218)."""
    jp, oc = _mk_limiters()
    pose = np.array([0.0, 0.0, 0.0])
    goal = np.array([0.25, 0.0])
    # v=0.6 for 0.4s travels 0.24m; with goal at 0.25 the substep scan enters
    # the 0.3 radius immediately.
    res = robot_cmd(
        jnp.asarray(pose), jnp.asarray(goal), jnp.zeros(2), jnp.zeros(2),
        jnp.float64(2.0), jnp.float64(0.0), jnp.float64(0.0), jp, jp, 0.4, 9, "diff",
    )
    o_pose, _, _, _, o_arr = oracle_cmd(
        pose, goal, 2.0, 0.0, 0.0, np.zeros(2), np.zeros(2), oc, oc, 0.4, "diff"
    )
    assert o_arr and bool(res.arrive)
    np.testing.assert_allclose(np.asarray(res.pose), o_pose, atol=1e-12)
