"""20-step end-to-end episode replay vs the NumPy oracle at bench shape.

Bench-shaped geometry (400x400 view window at 0.015 m, 960 beams, the
production PolarStatics branches) with 4 scripted robots and 2 dataset-
replayed pedestrians.  Every step compares the jitted env against a
sequential NumPy driver built from the oracle pieces, following the
reference step order (img_env.cpp:421-525):

  peds move (dataset replay) -> robot cmd (alive-gated, latched) ->
  layered compose (peds=1, other robots=2) -> per-robot collision code
  (latched skip) -> reward/done (yaml_env.py:371-376).

Poses, collision codes, arrive flags, rewards and dones must match
bit-for-bit (CPU x64) for all 20 steps, covering a wall collision, an
arrival, a robot-ped collision and a free-roaming robot.
"""

import math

import jax
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.oracle.np_oracle import (
    OracleGrid,
    OracleLimiter,
    oracle_cmd,
    oracle_draw,
)

T_STEPS = 20
DT = 0.4

# fixed scenario: room_10.png is a 10 m room with walls at the border
ROBOT_FIX = [
    [1.2, 5.0, math.pi],      # drives at the left wall -> static collision
    [4.0, 4.0, 0.0],          # goal 1.5 m ahead -> arrives
    [6.0, 2.0, math.pi / 2],  # drives into ped 0's path -> ped collision
    [8.0, 8.0, 0.3],          # wanders free
]
ROBOT_GOAL = [[8.0, 5.0, 0.0], [5.8, 4.0, 0.0], [6.0, 8.0, 0.0],
              [2.0, 2.0, 0.0]]
ACTIONS = np.asarray([
    [0.6, 0.0, 0.0],
    [0.45, 0.0, 0.0],
    [0.5, 0.0, 0.0],
    [0.3, 0.3, 0.0],
])


def _dataset():
    t = np.arange(25)
    # ped 0 marches along y=3.2..; crosses (6, ~3) where robot 2 drives
    p0 = np.stack([np.full(25, 6.0), 2.4 + 0.28 * t], -1)
    # ped 1 loiters in a small circle far from everyone
    ang = 0.5 * t
    p1 = np.stack([2.5 + 0.4 * np.cos(ang), 7.5 + 0.4 * np.sin(ang)], -1)
    traj = np.stack([p0, p1])                          # [2,25,2]
    vel = np.gradient(traj, axis=1) / DT
    return traj, vel, np.asarray([25, 25])


def _cfg():
    return EnvConfig.from_dict({
        "robot": {
            "total": 4,
            "begin_poses_type": ["fix"] * 4,
            "begin_poses": ROBOT_FIX,
            "target_poses_type": ["fix"] * 4,
            "target_poses": ROBOT_GOAL,
        },
        "ped_sim": {
            "total": 2, "type": "dataset", "max_speed": [1.2],
            "shape": ["circle"], "size": [[0.0, 0.0, 0.22]],
            "begin_poses_type": ["fix"], "begin_poses": [[6.0, 2.4, 0.0]],
            "target_poses_type": ["fix"], "target_poses": [[6.0, 9.0, 0.0]],
        },
        "object": {
            "total": 2, "shape": ["circle", "rectangle"],
            "size_range": [[0.3, 0.3], [-0.2, 0.2, -0.15, 0.15]],
            "poses_type": ["fix"], "poses": [[3.0, 7.0, 0.0], [7.5, 5.5, 0.4]],
        },
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.015, "width": 6.0, "height": 6.0},
        "range_total": 960,
        "control_hz": DT,
        "max_ped": 2,
    })


def _compose_and_codes(obs_map, ped_poses, ped_cloud, robot_poses,
                       robot_clouds, latched_coll, latched_arr, res):
    """view_ped + view_robot + per-robot draw(-1) (img_env.cpp:589-674)."""
    peds_map = obs_map.copy()
    g = OracleGrid(peds_map, res)
    for j in range(ped_poses.shape[0]):
        oracle_draw(g, ped_poses[j], ped_cloud, 1, "world_map")
    codes = latched_coll.copy()
    n = robot_poses.shape[0]
    for i in range(n):
        if latched_coll[i] > 0 or latched_arr[i]:
            continue
        gi = OracleGrid(peds_map.copy(), res)
        for j in range(n):
            if j != i:
                oracle_draw(gi, robot_poses[j], robot_clouds[j], 2,
                            "world_map")
        codes[i] = oracle_draw(gi, robot_poses[i], robot_clouds[i], -1,
                               "world_map")
    return codes


@pytest.mark.slow
def test_e2e_20step_replay_vs_oracle():
    cfg = _cfg()
    env = NavEnv(cfg)
    assert env.statics.polar.fill_window == 512      # bench-shaped branches
    traj, vel, lens = _dataset()
    state, obs = env.reset(jax.random.PRNGKey(0), dataset=(traj, vel, lens))

    st = env.statics
    res = st.resolution
    obs_map = np.asarray(state.obs_map)
    robot_clouds = [np.asarray(st.robot_points[i][st.robot_mask[i]])
                    for i in range(4)]
    ped_cloud0 = np.asarray(st.ped_body_points[0][st.ped_body_mask[0]])

    poses = np.asarray(state.robots.pose).copy()
    goals = np.asarray(
        np.concatenate([state.robots.goal,
                        state.robots.goal_yaw[:, None]], -1))
    last0 = np.zeros((4, 2))
    last1 = np.zeros((4, 2))
    coll = np.asarray(obs.is_collisions).copy()
    arrive = np.asarray(state.robots.arrive).copy()
    np.testing.assert_array_equal(poses[:, :2],
                                  np.asarray(ROBOT_FIX)[:, :2])

    lim = OracleLimiter(False, False, False, 0.0, 0.6, -2.0, 2.0)
    events = set()
    for t in range(T_STEPS):
        state, o, r, d, info = env.step(state, ACTIONS)

        # ---- oracle replica of the same step ----
        alive = (np.clip(coll, -1, 1) + arrive.astype(int)) == 0
        ped_pos = traj[:, min(t, traj.shape[1] - 1)]
        ped_vel = vel[:, min(t, traj.shape[1] - 1)]
        ped_yaw = np.arctan2(ped_vel[:, 1], ped_vel[:, 0])
        for i in range(4):
            if not alive[i]:
                continue
            poses[i], last0[i], last1[i], _, arr = oracle_cmd(
                poses[i], goals[i, :2], ACTIONS[i, 0], ACTIONS[i, 1], 0.0,
                last0[i], last1[i], lim, lim, DT)
            arrive[i] = arrive[i] or arr
        ped_pose3 = np.concatenate([ped_pos, ped_yaw[:, None]], -1)
        coll = _compose_and_codes(
            obs_map, ped_pose3, ped_cloud0, poses, robot_clouds,
            coll, arrive, res)

        # ---- bit-for-bit comparison ----
        np.testing.assert_allclose(
            np.asarray(state.robots.pose), poses, atol=1e-12,
            err_msg=f"step {t} poses")
        np.testing.assert_array_equal(
            np.asarray(o.is_collisions), coll, err_msg=f"step {t} collisions")
        np.testing.assert_array_equal(
            np.asarray(state.robots.arrive), arrive, err_msg=f"step {t}")
        np.testing.assert_array_equal(
            np.asarray(r), arrive.astype(np.float64) - coll,
            err_msg=f"step {t} reward")
        np.testing.assert_array_equal(
            np.asarray(d),
            np.clip(np.clip(coll, -1, 1) + arrive.astype(int), 0, 1),
            err_msg=f"step {t} dones")
        for i, c in enumerate(coll):
            if c:
                events.add(("coll", i, int(c)))
        for i, a in enumerate(arrive):
            if a:
                events.add(("arrive", i))

    # the scripted scenario must actually exercise the event codes
    assert ("coll", 0, 1) in events, events     # wall
    assert ("arrive", 1) in events, events      # goal
    assert ("coll", 2, 2) in events, events     # pedestrian
