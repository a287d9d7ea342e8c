"""Velocity / acceleration / jerk command limiting.

Branch-free JAX re-expression of the ros_controllers-style SpeedLimiter the
reference applies to each command axis independently (speed_limit.cpp:92-173,
invoked from agent.cpp:188-195).  Semantics are matched exactly, including the
asymmetric same-sign / sign-crossing acceleration handling.

Note: the reference's msg-constructor contains a bug — it assigns
``max_jerk = msg.min_jerk`` and leaves ``min_jerk`` uninitialized
(speed_limit.cpp:56-65).  Since no shipped config enables jerk limits, we
implement the documented behavior (config min/max jerk) instead of the bug.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from img_env_tpu.config import SpeedLimiterConfig


class LimiterParams(NamedTuple):
    """Array-of-structs limiter params; broadcastable against command batches."""

    has_velocity: jnp.ndarray
    has_acceleration: jnp.ndarray
    has_jerk: jnp.ndarray
    min_velocity: jnp.ndarray
    max_velocity: jnp.ndarray
    min_acceleration: jnp.ndarray
    max_acceleration: jnp.ndarray
    min_jerk: jnp.ndarray
    max_jerk: jnp.ndarray

    @staticmethod
    def from_config(cfg: SpeedLimiterConfig, dtype=jnp.float32) -> "LimiterParams":
        f = lambda x: jnp.asarray(x, dtype)
        b = lambda x: jnp.asarray(x, bool)
        return LimiterParams(
            b(cfg.has_velocity_limits), b(cfg.has_acceleration_limits),
            b(cfg.has_jerk_limits), f(cfg.min_velocity), f(cfg.max_velocity),
            f(cfg.min_acceleration), f(cfg.max_acceleration),
            f(cfg.min_jerk), f(cfg.max_jerk),
        )


def _sign(x):
    # C++ sign(): 0 for exactly 0, else +-1  (speed_limit.cpp:49-53)
    return jnp.where(x == 0, 0.0, jnp.sign(x))


def _limit_jerk(p: LimiterParams, v, v0, v1, dt):
    dv, dv0 = v - v0, v0 - v1
    dt2 = 2.0 * dt * dt
    da = jnp.clip(dv - dv0, p.min_jerk * dt2, p.max_jerk * dt2)
    return jnp.where(p.has_jerk, v0 + dv0 + da, v)


def _limit_acceleration(p: LimiterParams, v, v0, dt):
    v_sign, v0_sign = _sign(v), _sign(v0)
    dv_min, dv_max = p.min_acceleration * dt, p.max_acceleration * dt
    dv = v - v0
    dv_sign = _sign(dv)

    # --- same-sign (or touching zero) branch (speed_limit.cpp:123-134) ---
    same_dir = (dv_sign == v0_sign) | (dv_sign == v_sign)
    dv_a = dv_sign * jnp.clip(jnp.abs(dv), dv_min, dv_max)
    dv_b = dv_sign * jnp.abs(jnp.clip(-jnp.abs(dv), dv_min, dv_max))
    v_same = v0 + jnp.where(same_dir, dv_a, dv_b)

    # --- sign-crossing branch (speed_limit.cpp:135-148) ---
    zero_dt = jnp.abs(v0 / p.min_acceleration)
    v_dt = jnp.abs(v / p.max_acceleration)
    v_decel = v0_sign * (jnp.abs(v0) - jnp.abs(p.min_acceleration) * dt)
    v_accel = v_sign * jnp.abs(p.max_acceleration * (dt - zero_dt))
    v_cross = jnp.where(
        zero_dt >= dt, v_decel, jnp.where(zero_dt + v_dt >= dt, v_accel, v)
    )

    limited = jnp.where(v_sign + v0_sign != 0, v_same, v_cross)
    return jnp.where(p.has_acceleration, limited, v)


def _limit_velocity(p: LimiterParams, v):
    return jnp.where(p.has_velocity, jnp.clip(v, p.min_velocity, p.max_velocity), v)


def limit_command(p: LimiterParams, v, v0, v1, dt):
    """Full limit chain: jerk -> acceleration -> velocity (speed_limit.cpp:92-101)."""
    v = _limit_jerk(p, v, v0, v1, dt)
    v = _limit_acceleration(p, v, v0, dt)
    return _limit_velocity(p, v)
