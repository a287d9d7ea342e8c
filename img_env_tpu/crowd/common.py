"""Crowd-model-independent pedestrian bookkeeping.

Covers the img_env-level logic of ``_step_ped_normal`` (img_env.cpp:304-359):
trajectory waypoint cycling for ORCA goals, beep source sampling, and the
dataset replay branch (img_env.cpp:361-386).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from img_env_tpu.constants import PED_WAYPOINT_DIST_SQ


def advance_traj_goals(pos, traj, traj_len, traj_idx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Next ORCA goals with the reference's index quirk.

    The C++ checks arrival against ``trajectory_[cur_traj_index_]`` *without*
    the modulo used by ``_get_cur_goal`` (img_env.cpp:314-317, agent.cpp:839-843).
    Once the raw index reaches len(traj) the arrival check reads past the end
    (UB that in practice never triggers), so the index freezes and the goal
    stays ``traj[idx % len]`` forever.  We reproduce the observable behavior:
    no advance once idx == len.

    Returns (next_goals [M,2], new_traj_idx [M]).
    """
    len_safe = jnp.maximum(traj_len, 1)
    cur = jnp.take_along_axis(traj, (traj_idx % len_safe)[:, None, None], axis=1)[:, 0]
    in_range = traj_idx < traj_len
    check_goal = jnp.take_along_axis(
        traj, jnp.minimum(traj_idx, traj_len - 1)[:, None, None], axis=1
    )[:, 0]
    d_sq = jnp.sum((check_goal - pos) ** 2, -1)
    arrived = in_range & (d_sq < PED_WAYPOINT_DIST_SQ)
    new_idx = jnp.where(arrived, traj_idx + 1, traj_idx)
    goals = jnp.take_along_axis(traj, (new_idx % len_safe)[:, None, None], axis=1)[:, 0]
    return goals, new_idx


def sample_beeps(
    key, robot_pose, v_y, beep_r: float, ped_ca_p: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beep source sampling (img_env.cpp:323-342).

    Per robot: with probability ``ped_ca_p`` the pedestrians respond to the
    robot's beep (v_y > 0); responding robots contribute a source at their
    position with radius ``beep_r``, silent slots contribute ((0,0), 0).
    Returns (sources [N,2], radii [N], beeping [N] int32).
    """
    n = robot_pose.shape[0]
    u = jax.random.uniform(key, (n,))
    responds = (u < ped_ca_p) & (v_y > 0)
    sources = jnp.where(responds[:, None], robot_pose[:, :2], 0.0)
    radii = jnp.where(responds, beep_r, 0.0)
    return sources, radii, responds.astype(jnp.int32)


def dataset_replay(step, traj, traj_v, traj_len):
    """Dataset scene: read pose/vel at the clamped step index
    (img_env.cpp:361-386).  traj: [M,T,2]; traj_v: [M,T,2]."""
    idx = jnp.minimum(jnp.broadcast_to(step, traj_len.shape), traj_len - 1)
    idx = jnp.maximum(idx, 0)
    sel = lambda x: jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    pos = sel(traj)
    vel = sel(traj_v)
    yaw = jnp.arctan2(vel[:, 1], vel[:, 0])
    return pos, vel, yaw
