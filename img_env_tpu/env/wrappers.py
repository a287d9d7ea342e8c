"""Functional wrapper stack.

Every reference Gym wrapper (envs/wrapper/base.py, filter_states.py) becomes a
pure transformation over ``(Observation, reward, done, info, wrapper_state)``.
``WrapperStack`` composes them in the reference's innermost-first order from
``cfg.wrapper`` and exposes gym-like ``reset``/``step`` that run the whole
pipeline inside the environment's jitted step.

State that the reference keeps on wrapper instances (frame-stack deques,
elapsed-step counters, clean masks) lives in an explicit ``WrapperState``
pytree so batched/scanned rollouts stay functional.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.constants import (
    DONE_ARRIVE,
    DONE_TIMEOUT,
    PED_VEC_AVG,
    PED_VEC_STD,
)
from img_env_tpu.core.state import Observation
from img_env_tpu.env import rewards as rewards_mod


class WrapperState(NamedTuple):
    elapsed: jnp.ndarray        # [N] uint-like step counters (TimeLimit)
    is_clean: jnp.ndarray       # [N] bool (MultiRobotClean)
    q_images: jnp.ndarray       # [N, image_batch, H, W] frame stack
    q_states: jnp.ndarray       # [N, state_batch, state_dim]
    q_lasers: jnp.ndarray       # [N, laser_batch(>=1), R]


def init_wrapper_state(cfg: EnvConfig, n_robots: int = None) -> WrapperState:
    n = cfg.robot.total if n_robots is None else n_robots
    ib = max(cfg.image_batch, 0)
    sb = max(cfg.state_batch, 0)
    lb = max(cfg.laser_batch, 1) if cfg.laser_batch >= 0 else 0
    return WrapperState(
        elapsed=jnp.zeros((n,), jnp.int32),
        is_clean=jnp.ones((n,), bool),
        q_images=jnp.zeros((n, ib, cfg.image_size[0], cfg.image_size[1])),
        q_states=jnp.zeros((n, sb, cfg.state_dim)),
        q_lasers=jnp.zeros((n, lb, cfg.range_total)),
    )


# ---------------------------------------------------------------------------
# Individual wrappers as pure functions
# ---------------------------------------------------------------------------


def vel_action_map(cfg: EnvConfig, raw_actions) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VelActionWrapper (base.py:37-66): discrete index lookup or per-dim clip.

    raw_actions: [N] int indices (discrete) or [N, act_dim] floats.
    Returns ([N,3] (v,w,beep) commands, [N,2] speeds for info).
    """
    if cfg.discrete_action:
        raw_actions = jnp.asarray(raw_actions)
        if raw_actions.ndim != 1:
            raise ValueError(
                f"discrete_action config expects [N] action indices, got "
                f"shape {raw_actions.shape} — pass indices into "
                f"cfg.discrete_actions, not (v, w) pairs")
        table = np.zeros((len(cfg.discrete_actions), 3), np.float32)
        for i, a in enumerate(cfg.discrete_actions):
            table[i, : len(a)] = a
        cmds = jnp.asarray(table)[raw_actions.astype(jnp.int32)]
    else:
        cols = []
        for i in range(raw_actions.shape[-1]):
            lo, hi = cfg.continuous_actions[i]
            cols.append(jnp.clip(raw_actions[..., i], lo, hi))
        while len(cols) < 3:
            cols.append(jnp.zeros_like(cols[0]))
        cmds = jnp.stack(cols, axis=-1)
    return cmds, cmds[..., :2]


def paper_reward_wrapper(cfg: EnvConfig, obs: Observation, reward):
    return rewards_mod.paper_reward(
        obs.vector_states, obs.is_collisions, obs.is_arrives,
        obs.step_ds, obs.ped_min_dists, float(cfg.ped_safety_space),
    )


def time_limit_wrapper(cfg: EnvConfig, ws: WrapperState, done, dones_info):
    """TimeLimitWrapper (base.py:215-231)."""
    elapsed = ws.elapsed + 1
    over = elapsed > cfg.time_max
    done = jnp.where(over, 1, done)
    dones_info = jnp.where(over, DONE_TIMEOUT, dones_info)
    return ws._replace(elapsed=elapsed), done, dones_info


def info_log_wrapper(cfg: EnvConfig, obs: Observation, done, info: Dict):
    """InfoLogWrapper (base.py:234-254)."""
    di = info.get("dones_info", jnp.zeros_like(obs.is_collisions))
    di = jnp.where(obs.is_collisions > 0, obs.is_collisions, di)
    di = jnp.where(obs.is_arrives == 1, DONE_ARRIVE, di)
    info = dict(info)
    info["arrive"] = obs.is_arrives
    info["collision"] = obs.is_collisions
    info["dones_info"] = di
    info["all_down"] = jnp.sum(jnp.where(done > 0, 1, 0)) == done.shape[0]
    if cfg.ped_sim.total > 0:
        info["bool_get_close_to_human"] = jnp.where(obs.ped_min_dists < 1, 1, 0)
    return info


def multi_robot_clean_wrapper(ws: WrapperState, reward, speeds, done, info: Dict):
    """MultiRobotCleanWrapper (base.py:69-93)."""
    info = dict(info)
    info["is_clean"] = ws.is_clean
    reward = jnp.where(ws.is_clean, reward, 0.0)
    speeds = jnp.where(ws.is_clean[:, None], speeds, 0.0)
    new_clean = jnp.where(done > 0, False, ws.is_clean)
    return ws._replace(is_clean=new_clean), reward, speeds, info


def ped_vector_normalize(obs: Observation, cfg: EnvConfig) -> Observation:
    """StatePedVectorWrapper (base.py:19-34)."""
    pv = obs.ped_vector_states
    n = pv.shape[0]
    body = pv[:, 1:].reshape(n, cfg.max_ped, cfg.ped_vec_dim)
    count = pv[:, 0].astype(jnp.int32)
    j = jnp.arange(cfg.max_ped)
    active = j[None, :] < jnp.minimum(count, cfg.max_ped)[:, None]
    normed = (body - jnp.asarray(PED_VEC_AVG)) / jnp.asarray(PED_VEC_STD)
    body = jnp.where(active[..., None], normed, body)
    return obs._replace(
        ped_vector_states=jnp.concatenate(
            [pv[:, :1], body.reshape(n, -1)], axis=1
        )
    )


def state_batch_push(cfg: EnvConfig, ws: WrapperState, obs: Observation):
    """StateBatchWrapper (base.py:97-150): rolling frame stacks.

    Returns (new_ws, stacked sensor_maps [N,k,H,W], flattened vector_states
    [N,k*state_dim], stacked lasers [N,k,R]).
    """
    def push(q, x):
        if q.shape[1] == 0:
            return q, x
        q = jnp.concatenate([q[:, 1:], x[:, None]], axis=1)
        return q, q

    qi, imgs = push(ws.q_images, obs.sensor_maps.astype(ws.q_images.dtype))
    qs, vecs = push(ws.q_states, obs.vector_states.astype(ws.q_states.dtype))
    ql, lasers = push(ws.q_lasers, obs.lasers.astype(ws.q_lasers.dtype))
    if ws.q_states.shape[1] > 0:
        vecs = vecs.reshape(vecs.shape[0], -1)
    else:
        vecs = obs.vector_states
    if ws.q_images.shape[1] == 0:
        imgs = obs.sensor_maps
    if ws.q_lasers.shape[1] == 0:
        lasers = obs.lasers
    return ws._replace(q_images=qi, q_states=qs, q_lasers=ql), imgs, vecs, lasers


def state_batch_clear(ws: WrapperState) -> WrapperState:
    return ws._replace(
        q_images=jnp.zeros_like(ws.q_images),
        q_states=jnp.zeros_like(ws.q_states),
        q_lasers=jnp.zeros_like(ws.q_lasers),
        elapsed=jnp.zeros_like(ws.elapsed),
        is_clean=jnp.ones_like(ws.is_clean),
    )


# ---------------------------------------------------------------------------
# Composed stack
# ---------------------------------------------------------------------------


class StackedObs(NamedTuple):
    """Observation after StateBatch/filter wrappers (reference layout)."""

    sensor_maps: jnp.ndarray      # [N,k,H,W]
    vector_states: jnp.ndarray    # [N,k*state_dim]
    lasers: jnp.ndarray           # [N,k,R]
    raw: Observation


class WrapperStack:
    """Applies the configured wrapper pipeline functionally.

    Wrapper order in the reference config only matters for a few pairs
    (reward before/after TimeLimit etc.); the canonical test.yaml order is
    hard-wired here: VelAction -> TimeLimit -> PaperReward -> InfoLog ->
    MultiRobotClean -> [StatePedVector] -> StateBatch -> NeverStop(auto-reset).
    Unlisted wrappers are skipped.
    """

    def __init__(self, cfg: EnvConfig, n_robots: int = None):
        self.cfg = cfg
        self.n_robots = cfg.robot.total if n_robots is None else n_robots
        w = set(cfg.wrapper) if cfg.wrapper else {
            "VelActionWrapper", "TimeLimitWrapper", "SensorsPaperRewardWrapper",
            "InfoLogWrapper", "MultiRobotCleanWrapper", "StateBatchWrapper",
            "NeverStopWrapper",
        }
        self.use_paper_reward = "SensorsPaperRewardWrapper" in w
        self.use_time_limit = "TimeLimitWrapper" in w
        self.use_info_log = "InfoLogWrapper" in w
        self.use_clean = "MultiRobotCleanWrapper" in w
        self.use_ped_norm = "StatePedVectorWrapper" in w
        self.use_batch = "StateBatchWrapper" in w
        self.use_never_stop = "NeverStopWrapper" in w
        self.use_vel_action = "VelActionWrapper" in w

    def init_state(self) -> WrapperState:
        return init_wrapper_state(self.cfg, self.n_robots)

    def on_reset(self, ws: WrapperState, obs: Observation):
        ws = state_batch_clear(ws)
        if self.use_ped_norm:
            obs = ped_vector_normalize(obs, self.cfg)
        if self.use_batch:
            ws, imgs, vecs, lasers = state_batch_push(self.cfg, ws, obs)
        else:
            imgs, vecs, lasers = obs.sensor_maps, obs.vector_states, obs.lasers
        return ws, StackedObs(imgs, vecs, lasers, obs)

    def on_step(self, ws: WrapperState, obs: Observation, reward, done, info):
        cfg = self.cfg
        if self.use_paper_reward:
            reward = paper_reward_wrapper(cfg, obs, reward)
        dones_info = info.get("dones_info", jnp.zeros_like(obs.is_collisions))
        if self.use_time_limit:
            ws, done, dones_info = time_limit_wrapper(cfg, ws, done, dones_info)
        info = dict(info)
        info["dones_info"] = dones_info
        if self.use_info_log:
            info = info_log_wrapper(cfg, obs, done, info)
        speeds = info.get("speeds", jnp.zeros((obs.is_collisions.shape[0], 2)))
        if self.use_clean:
            ws, reward, speeds, info = multi_robot_clean_wrapper(
                ws, reward, speeds, done, info
            )
        info["speeds"] = speeds
        if self.use_ped_norm:
            obs = ped_vector_normalize(obs, cfg)
        if self.use_batch:
            ws, imgs, vecs, lasers = state_batch_push(cfg, ws, obs)
        else:
            imgs, vecs, lasers = obs.sensor_maps, obs.vector_states, obs.lasers
        return ws, StackedObs(imgs, vecs, lasers, obs), reward, done, info
