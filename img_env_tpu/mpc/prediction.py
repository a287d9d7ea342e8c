"""Pedestrian trajectory prediction heads for the MPC horizon.

SURVEY.md §7.2 M4: "multi-strategy ped prediction (constant-velocity /
ORCA / SFM heads)".  The controller predicts each pedestrian's next H
positions ONCE per solve with the chosen crowd model and shares the
prediction across all K candidate rollouts:

  * 'cv'   — constant velocity (cheapest, default)
  * 'orca' — roll the batched ORCA solver forward H steps, pref velocity
             toward the ped's extrapolated goal (crowd/orca.py)
  * 'sfm'  — roll the batched Social Force Model forward H steps
             (crowd/sfm.py)

The predicted robot influence is ignored (robots are the decision
variables); obstacles enter the ORCA head via the episode AABBs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from img_env_tpu.crowd import orca as orca_mod
from img_env_tpu.crowd import sfm as sfm_mod


def predict_cv(pos, vel, horizon: int, dt: float):
    """[H,M,2] constant-velocity extrapolation."""
    t = (jnp.arange(horizon) + 1.0)[:, None, None] * dt
    return pos[None] + vel[None] * t


def predict_orca(pos, vel, vmax, horizon: int, dt: float,
                 orca_cfg, segments=None, goal_lookahead: float = 4.0):
    """[H,M,2] by iterating the batched ORCA solve (goals = extrapolated)."""
    m = pos.shape[0]
    goals = pos + vel * goal_lookahead
    radius = jnp.full((m,), orca_cfg.radius)
    valid = jnp.ones((m,), bool)
    no_robots = jnp.zeros((0, 2))
    seg = segments if segments is not None else orca_mod.segments_from_aabbs(
        jnp.zeros((0, 4)), jnp.zeros((0,), bool))

    def body(carry, _):
        p, v = carry
        pref = orca_mod.pref_velocity(p, goals)
        p2, v2 = orca_mod.orca_step(
            p, v, pref, radius, vmax, valid,
            no_robots, no_robots, jnp.zeros((0,), bool),
            orca_cfg, seg)
        return (p2, v2), p2

    (_, _), traj = jax.lax.scan(body, (pos, vel), None, length=horizon)
    return traj


def predict_sfm(pos, vel, vmax, horizon: int, dt: float,
                goal_lookahead: float = 4.0):
    """[H,M,2] by iterating the batched SFM (single far waypoint)."""
    m = pos.shape[0]
    goals = pos + vel * goal_lookahead
    wp = sfm_mod.SfmWaypointState(
        wp_xy=jnp.stack([goals, goals, goals], axis=1),
        wp_r=jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (m, 3)),
        wp_len=jnp.full((m,), 2, jnp.int32),
        dest_idx=jnp.zeros((m,), jnp.int32),
        head=jnp.full((m,), -1, jnp.int32),
        has_dest=jnp.ones((m,), bool),
    )
    seg = jnp.zeros((0, 2))
    seg_valid = jnp.zeros((0,), bool)
    valid = jnp.ones((m,), bool)

    def body(carry, _):
        p, v, w = carry
        p2, v2, w2 = sfm_mod.sfm_step(p, v, vmax, valid, w, seg, seg, seg_valid, dt)
        return (p2, v2, w2), p2

    (_, _, _), traj = jax.lax.scan(body, (pos, vel, wp), None, length=horizon)
    return traj


def predict_peds(mode: str, pos, vel, vmax, horizon: int, dt: float,
                 orca_cfg=None, segments=None):
    """Dispatch. Returns [H,M,2] predicted positions (M may be 0)."""
    if pos.shape[0] == 0:
        return jnp.zeros((horizon, 0, 2))
    if mode == "orca" and orca_cfg is not None:
        return predict_orca(pos, vel, vmax, horizon, dt, orca_cfg, segments)
    if mode == "sfm":
        return predict_sfm(pos, vel, vmax, horizon, dt)
    return predict_cv(pos, vel, horizon, dt)
