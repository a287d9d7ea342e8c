"""Full-episode ERVO (beep evacuation) parity: env vs sequential oracle.

The IROS-21 distinguishing feature (ervoscene.h:13-22, img_env.cpp:323-342):
robots emit beeps (v_y > 0 with probability ped_ca_p) and ERVO pedestrians
add an evacuation velocity away from each in-range source AFTER the ORCA
LP.  This test drives the FULL env step for 15 steps with a moving beeping
robot and a silent one under the stochastic ped_ca_p branch (0.5), and
checks every ped position/velocity bit-for-bit-ish (1e-8) against
``orca_oracle_step`` fed the env's own sampled beeps (info["beeps"]).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.oracle.orca_oracle import orca_oracle_step

T_STEPS = 15
BEEP_R = 1.5
DT = 0.4

PED_FIX = [[4.5, 4.5, 0], [4.5, 5.5, 0], [5.5, 4.5, 0],
           [5.5, 5.5, 0], [4.0, 5.0, 0], [6.0, 5.0, 0]]
PED_GOAL = [[8.5, 8.5, 0], [1.5, 8.5, 0], [8.5, 1.5, 0],
            [1.5, 1.5, 0], [8.5, 5.0, 0], [1.5, 5.0, 0]]


def _cfg():
    m = len(PED_FIX)
    return EnvConfig.from_dict({
        "env_name": "ervo_ep", "control_hz": DT, "act_dim": 3,
        "ped_ca_p": 0.5, "beep_r": BEEP_R, "relation_ped_robo": 1,
        "robot": {"total": 2, "shape": ["circle"], "size": [[0, 0, 0.17]],
                  "begin_poses_type": ["fix"] * 2,
                  "begin_poses": [[5.0, 5.0, 0.8], [3.0, 3.0, -0.5]],
                  "target_poses_type": ["fix"] * 2,
                  "target_poses": [[9.0, 9.0, 0.0], [1.0, 1.0, 0.0]]},
        "object": {"total": 1, "shape": ["rectangle"],
                   "size_range": [[-0.3, 0.3, -0.2, 0.2]],
                   "poses_type": ["fix"], "poses": [[6.5, 6.5, 0.0]]},
        "ped_sim": {"total": m, "type": "ervoscene", "max_speed": [0.5],
                    "shape": ["circle"], "size": [[0, 0, 0.17]],
                    "begin_poses_type": ["fix"] * m,
                    "begin_poses": PED_FIX,
                    "target_poses_type": ["fix"] * m,
                    "target_poses": PED_GOAL,
                    "go_back": "no"},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 3.0, "height": 3.0},
        "range_total": 64, "max_ped": m, "state_dim": 3,
        "sensor_mode": "fast",
    })


def _np_pref(pos, goals):
    g = goals - pos
    n = np.linalg.norm(g, axis=-1, keepdims=True)
    return np.where(n > 1.0, g / np.maximum(n, 1e-30), g)


def test_ervo_episode_oracle_parity():
    cfg = _cfg()
    env = NavEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(2))
    goals = np.asarray([g[:2] for g in PED_GOAL])
    aabbs = np.asarray(state.obstacles.aabb)

    # robot 0 beeps every step (v_y=1); robot 1 stays silent
    actions = jnp.asarray([[0.4, 0.2, 1.0], [0.3, -0.1, 0.0]])
    beeped_total = 0
    for step in range(T_STEPS):
        prev_ped_pos = np.asarray(state.peds.pos, np.float64)
        prev_ped_vel = np.asarray(state.peds.vel, np.float64)
        prev_rob_pos = np.asarray(state.robots.pose[:, :2], np.float64)
        prev_rob_vel = np.asarray(state.robots.vel_world, np.float64)

        state, obs, r, d, info = env.step(state, actions)

        beeps = np.asarray(info["beeps"])
        beeped_total += int(beeps[0])
        assert beeps[1] == 0, "silent robot must never beep"

        sources = np.where(beeps[:, None] > 0, prev_rob_pos, 0.0)
        radii = np.where(beeps > 0, BEEP_R, 0.0)
        pref = _np_pref(prev_ped_pos, goals)
        want_pos, want_vel = orca_oracle_step(
            prev_ped_pos, prev_ped_vel, pref,
            np.full(len(PED_FIX), 0.5), np.full(len(PED_FIX), 0.5),
            prev_rob_pos, prev_rob_vel, aabbs, time_step=DT,
            evac_sources=sources, evac_radii=radii,
        )
        np.testing.assert_allclose(
            np.asarray(state.peds.pos), want_pos, atol=1e-8,
            err_msg=f"step {step} (beeps={beeps})")
        np.testing.assert_allclose(
            np.asarray(state.peds.vel), want_vel, atol=1e-8,
            err_msg=f"step {step}")

    # the stochastic branch must actually branch: with ped_ca_p=0.5 over 15
    # steps, P(all-or-none) < 1e-4 — both outcomes must appear
    assert 0 < beeped_total < T_STEPS, (
        f"ped_ca_p branch never flipped (beeped {beeped_total}/{T_STEPS})")


def test_shipped_ervo_config_beeps():
    """The shipped ervo_crowd.yaml drives the beep path end-to-end: beeps
    fire and in-range peds gain the evacuation velocity."""
    import img_env_tpu

    import os

    path = os.path.join(os.path.dirname(img_env_tpu.__file__),
                        "configs", "ervo_crowd.yaml")
    cfg = EnvConfig.from_yaml(path)
    assert cfg.ped_sim.type == "ervoscene" and cfg.act_dim == 3
    env = NavEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    n = cfg.robot.total
    acts = jnp.concatenate(
        [jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))], 0)
    fired = 0
    for _ in range(6):
        state, obs, r, d, info = env.step(state, acts)
        fired += int(np.asarray(info["beeps"]).sum())
    assert fired > 0
