"""Reward functions (pure, batched over robots).

``paper_reward`` reproduces SensorsPaperRewardWrapper (envs/wrapper/base.py:
153-195) exactly, including the quirk that the pedestrian-proximity penalty is
*overwritten* (not added) by the -500 collision penalty, and that arrival
checks both the current goal distance and the latched arrive flag.
"""

from __future__ import annotations

import jax.numpy as jnp

from img_env_tpu.constants import (
    ARRIVE_DIST,
    REWARD_COLLISION,
    REWARD_DISTANCE_FACTOR,
    REWARD_PED_FACTOR,
    REWARD_REACH,
    REWARD_STEP,
)


def paper_reward(
    vec_states, is_collisions, is_arrives, step_ds, ped_min_dists,
    ped_safety_space: float,
):
    d = jnp.sqrt(vec_states[:, 0] ** 2 + vec_states[:, 1] ** 2)
    proximity = jnp.where(
        ped_min_dists <= ped_safety_space,
        REWARD_PED_FACTOR * (ped_safety_space - ped_min_dists),
        0.0,
    )
    collided = is_collisions > 0
    collision_r = jnp.where(collided, REWARD_COLLISION, proximity)
    reached = (d < ARRIVE_DIST) | (is_arrives > 0)
    reach_r = jnp.where(jnp.logical_not(collided) & reached, REWARD_REACH, 0.0)
    moving = jnp.logical_not(collided) & jnp.logical_not(reached)
    distance_r = jnp.where(moving, step_ds * REWARD_DISTANCE_FACTOR, 0.0)
    step_r = jnp.where(moving, REWARD_STEP, 0.0)
    return collision_r + reach_r + distance_r + step_r


def base_reward(is_collisions, is_arrives):
    """ImageEnv.step's raw reward: arrive - collision_code (yaml_env.py:373)."""
    return is_arrives.astype(jnp.float32) - is_collisions.astype(jnp.float32)


def compute_dones(is_collisions, is_arrives):
    """yaml_env.py:374-376: clip(clip(coll,-1,1) + arrive, 0, 1)."""
    d = jnp.clip(is_collisions, -1, 1) + is_arrives
    return jnp.clip(d, 0, 1)
