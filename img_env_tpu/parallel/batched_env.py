"""Scene-batched, mesh-sharded environment.

``BatchedNavEnv`` vmaps the single-scene pure functions over a leading
``[S]`` scene axis and (optionally) pins that axis to the ``scene`` mesh
axis, so S scenes x N robots step as one XLA program — the TPU-native
replacement for the reference's one-ROS-node-per-scene fan-out
(create_launch.py:25-34, SURVEY.md §2.1 parallelism table).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.parallel.mesh import SCENE_AXIS


class BatchedNavEnv:
    """S independent scenes of the same config, stepped together.

    reset(keys [S,2]) -> (states, obs)       # every leaf gains a leading S
    step(states, actions [S,N,3]) -> (states, obs, reward [S,N], done, info)
    """

    def __init__(self, cfg: EnvConfig, mesh: Optional[Mesh] = None, jit: bool = True):
        self.cfg = cfg
        self.mesh = mesh
        self.core = NavEnv(cfg, jit=False)
        tables = self.core.sensor_tables

        def reset_fn(keys):
            out = jax.vmap(
                lambda key: self.core.reset_fn(key, sensor_tables=tables)
            )(keys)
            return self._constrain(out)

        def step_fn(states, actions):
            out = jax.vmap(
                lambda s, a: self.core.step_fn(s, a, sensor_tables=tables)
            )(states, actions)
            return self._constrain(out)

        self.reset_fn = reset_fn
        self.step_fn = step_fn
        self._reset = jax.jit(reset_fn) if jit else reset_fn
        self._step = jax.jit(step_fn) if jit else step_fn

    def _constrain(self, tree):
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P(SCENE_AXIS))

        def c(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                return jax.lax.with_sharding_constraint(x, sh)
            return x

        return jax.tree_util.tree_map(c, tree)

    def reset(self, keys):
        return self._reset(keys)

    def step(self, states, actions):
        return self._step(states, jnp.asarray(actions))

def rollout_with_obs(env: BatchedNavEnv, states, obs, keys, policy_fn):
    """Scan ``len(keys)`` steps; policy_fn(key, obs) -> [S,N,3] actions.

    Returns (final_states, final_obs, rewards [T,S,N], dones [T,S,N]).
    Everything stays on device; one compiled program for the whole horizon.
    """

    def body(carry, key):
        states, obs = carry
        actions = policy_fn(key, obs)
        states, obs, reward, done, info = env.step_fn(states, actions)
        return (states, obs), (reward, done)

    (states, obs), (rewards, dones) = jax.lax.scan(body, (states, obs), keys)
    return states, obs, rewards, dones
