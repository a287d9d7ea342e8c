"""Batched ORCA solver vs sequential NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.crowd.obstacle_split import split_segments
from img_env_tpu.crowd.orca import (
    OrcaConfig,
    orca_step,
    pref_velocity,
)
from img_env_tpu.oracle.orca_oracle import orca_oracle_step


def _split_segs(aabbs):
    """Engine-side segments: through the RVO2 kd-tree splitting, as the
    env reset builds them (crowd/obstacle_split.py)."""
    seg, _ = split_segments(jnp.asarray(aabbs), jnp.ones(len(aabbs), bool))
    return seg


def _cluster_scene(rng, m=8, n_rob=3, n_obs=3):
    """Random scene with agents clustered tightly enough to interact
    (neighbor_dist is only 0.5 in the reference's configuration)."""
    center = rng.uniform(3, 7, 2)
    ped_pos = center + rng.uniform(-0.8, 0.8, (m, 2))
    ped_vel = rng.uniform(-0.5, 0.5, (m, 2))
    goals = center + rng.uniform(-4, 4, (m, 2))
    ped_radius = np.full(m, 0.5)
    ped_max_speed = rng.uniform(0.4, 0.6, m)
    robot_pos = center + rng.uniform(-0.9, 0.9, (n_rob, 2))
    robot_vel = rng.uniform(-0.4, 0.4, (n_rob, 2))
    aabbs = []
    for _ in range(n_obs):
        c = center + rng.uniform(-2.0, 2.0, 2)
        w, h = rng.uniform(0.2, 0.6, 2)
        aabbs.append([c[0] - w, c[1] - h, c[0] + w, c[1] + h])
    aabbs = np.array(aabbs)
    return ped_pos, ped_vel, goals, ped_radius, ped_max_speed, robot_pos, robot_vel, aabbs


def _np_pref(pos, goals):
    g = goals - pos
    n = np.linalg.norm(g, axis=-1, keepdims=True)
    return np.where(n > 1.0, g / np.maximum(n, 1e-30), g)


@pytest.mark.parametrize("trial", range(4))
def test_orca_single_step_parity(rng, trial):
    (ped_pos, ped_vel, goals, ped_radius, ped_max_speed,
     robot_pos, robot_vel, aabbs) = _cluster_scene(rng)
    m, n = len(ped_pos), len(robot_pos)
    cfg = OrcaConfig(time_step=0.4, max_obs_segments=16)
    seg = _split_segs(aabbs)
    pref = _np_pref(ped_pos, goals)

    got_pos, got_vel = orca_step(
        jnp.asarray(ped_pos), jnp.asarray(ped_vel), jnp.asarray(pref),
        jnp.asarray(ped_radius), jnp.asarray(ped_max_speed),
        jnp.ones(m, bool),
        jnp.asarray(robot_pos), jnp.asarray(robot_vel), jnp.ones(n, bool),
        cfg, seg,
    )
    want_pos, want_vel = orca_oracle_step(
        ped_pos, ped_vel, pref, ped_radius, ped_max_speed,
        robot_pos, robot_vel, aabbs, time_step=0.4,
    )
    np.testing.assert_allclose(np.asarray(got_vel), want_vel, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_pos), want_pos, atol=1e-8)


def test_orca_rollout_parity(rng):
    (ped_pos, ped_vel, goals, ped_radius, ped_max_speed,
     robot_pos, robot_vel, aabbs) = _cluster_scene(rng, m=6, n_rob=2, n_obs=2)
    m, n = len(ped_pos), len(robot_pos)
    cfg = OrcaConfig(time_step=0.4)
    seg = _split_segs(aabbs)

    jp, jv = jnp.asarray(ped_pos), jnp.asarray(ped_vel)
    op, ov = ped_pos.copy(), ped_vel.copy()
    for step in range(15):
        pref = _np_pref(np.asarray(jp), goals)
        jp, jv = orca_step(
            jp, jv, jnp.asarray(pref), jnp.asarray(ped_radius),
            jnp.asarray(ped_max_speed), jnp.ones(m, bool),
            jnp.asarray(robot_pos), jnp.asarray(robot_vel), jnp.ones(n, bool),
            cfg, seg,
        )
        opref = _np_pref(op, goals)
        op, ov = orca_oracle_step(
            op, ov, opref, ped_radius, ped_max_speed,
            robot_pos, robot_vel, aabbs, time_step=0.4,
        )
        np.testing.assert_allclose(np.asarray(jp), op, atol=1e-6, err_msg=f"step {step}")


def test_ervo_evac_parity(rng):
    (ped_pos, ped_vel, goals, ped_radius, ped_max_speed,
     robot_pos, robot_vel, aabbs) = _cluster_scene(rng, m=5, n_rob=2, n_obs=1)
    m, n = len(ped_pos), len(robot_pos)
    cfg = OrcaConfig(time_step=0.4)
    seg = _split_segs(aabbs)
    pref = _np_pref(ped_pos, goals)
    # one beeping robot, one silent (radius 0 sentinel like the reference)
    sources = np.stack([robot_pos[0], np.zeros(2)])
    radii = np.array([1.0, 0.0])

    got_pos, got_vel = orca_step(
        jnp.asarray(ped_pos), jnp.asarray(ped_vel), jnp.asarray(pref),
        jnp.asarray(ped_radius), jnp.asarray(ped_max_speed), jnp.ones(m, bool),
        jnp.asarray(robot_pos), jnp.asarray(robot_vel), jnp.ones(n, bool),
        cfg, seg,
        evac_sources=jnp.asarray(sources), evac_radii=jnp.asarray(radii),
    )
    want_pos, want_vel = orca_oracle_step(
        ped_pos, ped_vel, pref, ped_radius, ped_max_speed,
        robot_pos, robot_vel, aabbs, time_step=0.4,
        evac_sources=sources, evac_radii=radii,
    )
    np.testing.assert_allclose(np.asarray(got_vel), want_vel, atol=1e-8)


def test_pref_velocity_rule():
    pos = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    goal = jnp.asarray([[3.0, 4.0], [0.3, 0.4]])
    got = np.asarray(pref_velocity(pos, goal))
    np.testing.assert_allclose(got[0], [0.6, 0.8], atol=1e-12)  # normalized
    np.testing.assert_allclose(got[1], [0.3, 0.4], atol=1e-12)  # short: raw
