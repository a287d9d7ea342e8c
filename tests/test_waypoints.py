"""Scripted multi-waypoint pedestrian trajectories (Agent.trajectory).

The reference cycles ``trajectory_[cur_traj_index_ % size]``
(agent.cpp:839-843) with the arrival check reading the RAW index
(img_env.cpp:314-317) — so waypoints are visited once in order and the
goal then sticks to waypoint 0 (index frozen at len).
"""

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.crowd.common import advance_traj_goals
from img_env_tpu.env.nav_env import NavEnv

WPS = [[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0]]


def test_advance_cycles_four_waypoints():
    traj = jnp.asarray([WPS])                    # [1,4,2]
    traj_len = jnp.asarray([4], jnp.int32)
    idx = jnp.asarray([0], jnp.int32)
    pos = jnp.asarray([[2.0, 2.0]])              # standing on wp0
    seen = []
    for k in range(6):
        goals, idx = advance_traj_goals(pos, traj, traj_len, idx)
        seen.append(np.asarray(goals[0]).tolist())
        pos = goals                              # teleport to the goal
    # arrive wp0 -> goal wp1, arrive wp1 -> wp2, wp2 -> wp3, wp3 -> wp0
    assert seen[0] == WPS[1]
    assert seen[1] == WPS[2]
    assert seen[2] == WPS[3]
    assert seen[3] == WPS[0]
    # raw index frozen at len: goal stays wp0 forever (the UB-freeze quirk)
    assert seen[4] == WPS[0] and seen[5] == WPS[0]
    assert int(idx[0]) == 4


def _wp_cfg(ped_type):
    return EnvConfig.from_dict({
        "robot": {"total": 1},
        "ped_sim": {
            "total": 2, "type": ped_type, "max_speed": [0.8],
            "shape": ["circle"], "size": [[0, 0, 0.17]],
            "waypoints": [WPS, []],
        },
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "range_total": 60,
        "time_max": 50,
    })


def test_env_scripted_ped_walks_the_loop():
    env = NavEnv(_wp_cfg("rvoscene"))
    s, _ = env.reset(jax.random.PRNGKey(0))
    assert s.peds.traj.shape[1] == 4
    assert int(s.peds.traj_len[0]) == 4          # scripted ped
    assert int(s.peds.traj_len[1]) in (1, 2)     # goal (+return) ped
    np.testing.assert_allclose(np.asarray(s.peds.traj[0]), WPS)

    # drive the env; the scripted ped must approach wp0 then advance
    best0 = np.inf
    idx_seen = set()
    for _ in range(50):
        s, o, r, d, info = env.step(s, np.zeros((1, 3)))
        p = np.asarray(s.peds.pos[0])
        best0 = min(best0, np.hypot(p[0] - WPS[0][0], p[1] - WPS[0][1]))
        idx_seen.add(int(s.peds.traj_idx[0]))
    assert best0 < 0.25, f"never reached wp0 (best {best0:.2f})"
    assert max(idx_seen) >= 1, "trajectory index never advanced"


def test_env_scripted_ped_sfm_mode_builds():
    """pedscene mode: waypoint queue = [goal r1] + trajectory (pedscene.h)."""
    env = NavEnv(_wp_cfg("pedscene"))
    s, _ = env.reset(jax.random.PRNGKey(1))
    for _ in range(5):
        s, o, r, d, info = env.step(s, np.zeros((1, 3)))
    assert np.isfinite(np.asarray(s.peds.pos)).all()
