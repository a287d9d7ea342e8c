"""Differential-drive / omnidirectional robot stepping.

Functional JAX equivalent of ``Agent::cmd`` (agent.cpp:186-283):

  1. speed-limit (v, w) against the two previous commands;
  2. scan 0.05 s substeps of the *Euler* odometry purely to detect mid-step
     arrival (dist-to-goal <= 0.3) — stopping the scan freezes the reported
     world velocity at the arrival substep, like the C++ ``break``;
  3. advance the actual pose with the exact arc (or straight-line) formula
     over the full control step;
  4. re-check arrival at the final pose.

Everything is written for a single robot and ``vmap``-ed over N (and again
over scenes) by callers.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from img_env_tpu.constants import ARRIVE_DIST, SUBSTEP_DT
from img_env_tpu.dynamics.limiter import LimiterParams, limit_command


class CmdResult(NamedTuple):
    pose: jnp.ndarray        # [3] new world pose
    vw_last0: jnp.ndarray    # [2] limited command (becomes next-step v0)
    vw_last1: jnp.ndarray    # [2]
    vel_world: jnp.ndarray   # [2] (vx, vy) reported to the crowd model
    arrive: jnp.ndarray      # [] bool


def _substep_arrival(pose, goal, v, w, v_y, n_substeps: int, omni: bool):
    """Euler substep scan for mid-step arrival (agent.cpp:200-219, 240-255)."""

    def body(carry, _):
        x, y, th, vx, vy, arrived = carry
        # Once arrived the C++ loop breaks: freeze everything.
        c, s = jnp.cos(th), jnp.sin(th)
        if omni:
            nx = x + v * SUBSTEP_DT * c - v_y * SUBSTEP_DT * s
            ny = y + v * SUBSTEP_DT * s + v_y * SUBSTEP_DT * c
            nvx, nvy = vx, vy  # omni branch never updates vx/vy (agent.cpp:238-255)
        else:
            nx = x + v * SUBSTEP_DT * c
            ny = y + v * SUBSTEP_DT * s
            nvx, nvy = v * c, v * s  # uses theta before the rotation update
        nth = th + w * SUBSTEP_DT
        d = jnp.sqrt((nx - goal[0]) ** 2 + (ny - goal[1]) ** 2)
        now_arrived = d <= ARRIVE_DIST
        keep = jnp.logical_not(arrived)
        new = (
            jnp.where(keep, nx, x), jnp.where(keep, ny, y),
            jnp.where(keep, nth, th),
            jnp.where(keep, nvx, vx), jnp.where(keep, nvy, vy),
            arrived | now_arrived,
        )
        return new, None

    zero = jnp.zeros((), pose.dtype)
    init = (pose[0], pose[1], pose[2], zero, zero, jnp.array(False))
    (x, y, th, vx, vy, arrived), _ = jax.lax.scan(body, init, None, length=n_substeps)
    return jnp.stack([vx, vy]), arrived


def _exact_pose_update(pose, v, w, v_y, dt: float, omni: bool):
    """Closed-form arc update (agent.cpp:220-236, 256-273)."""
    th = pose[2]
    c, s = jnp.cos(th), jnp.sin(th)
    # straight-line branch (w == 0 exactly, as in the reference)
    if omni:
        straight = jnp.stack(
            [pose[0] + v * dt * c - v_y * dt * s,
             pose[1] + v * dt * s + v_y * dt * c,
             th + w * dt]
        )
    else:
        straight = jnp.stack([pose[0] + v * dt * c, pose[1] + v * dt * s, th + w * dt])
    w_safe = jnp.where(w == 0, 1.0, w)
    vw = v / w_safe
    ca, sa = jnp.cos(th + w * dt), jnp.sin(th + w * dt)
    ax = pose[0] - vw * s + vw * sa
    ay = pose[1] + vw * c - vw * ca
    if omni:
        vyw = v_y / w_safe
        ax = ax - vyw * c + vyw * ca
        ay = ay - vyw * s + vyw * sa
    arc = jnp.stack([ax, ay, th + w * dt])
    return jnp.where(w == 0, straight, arc)


def robot_cmd(
    pose: jnp.ndarray,
    goal: jnp.ndarray,
    vw_last0: jnp.ndarray,
    vw_last1: jnp.ndarray,
    v: jnp.ndarray,
    w: jnp.ndarray,
    v_y: jnp.ndarray,
    limiter_v: LimiterParams,
    limiter_w: LimiterParams,
    dt: float,
    n_substeps: int,
    ktype: str = "diff",
) -> CmdResult:
    omni = ktype == "omni"
    v = limit_command(limiter_v, v, vw_last0[0], vw_last1[0], dt)
    w = limit_command(limiter_w, w, vw_last0[1], vw_last1[1], dt)

    vel_world, arrive_sub = _substep_arrival(pose, goal, v, w, v_y, n_substeps, omni)
    new_pose = _exact_pose_update(pose, v, w, v_y, dt, omni)
    d_final = jnp.linalg.norm(new_pose[:2] - goal)
    arrive = arrive_sub | (d_final <= ARRIVE_DIST)

    return CmdResult(
        pose=new_pose,
        vw_last0=jnp.stack([v, w]),
        vw_last1=vw_last0,
        vel_world=vel_world,
        arrive=arrive,
    )


def batched_robot_cmd(
    poses, goals, vw_last0, vw_last1, vel_world_prev, v, w, v_y, alive,
    limiter_v: LimiterParams, limiter_w: LimiterParams,
    dt: float, n_substeps: int, ktype: str = "diff",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmap over robots with an alive mask.

    Dead robots (alive=False) are frozen in place and keep their previous
    command history *and* world velocity (the reference skips ``cmd`` for
    ``alive == false`` robots but still forwards the stale member vx/vy to
    the crowd model, img_env.cpp:389-418).
    Returns (pose, vw_last0, vw_last1, vel_world, arrive).
    """
    run = jax.vmap(
        lambda p, g, l0, l1, vi, wi, vyi: robot_cmd(
            p, g, l0, l1, vi, wi, vyi, limiter_v, limiter_w, dt, n_substeps, ktype
        )
    )
    res = run(poses, goals, vw_last0, vw_last1, v, w, v_y)
    m = alive[:, None]
    pose = jnp.where(m, res.pose, poses)
    l0 = jnp.where(m, res.vw_last0, vw_last0)
    l1 = jnp.where(m, res.vw_last1, vw_last1)
    vel = jnp.where(m, res.vel_world, vel_world_prev)
    arrive = jnp.where(alive, res.arrive, False)
    return pose, l0, l1, vel, arrive
