"""PPO over the batched env: rollout + update as ONE jitted, sharded program.

This is the training analogue of the reference's use-case (the env existed to
train the Sensors-20 / IROS-21 policies).  The whole step — T env steps with
the current policy, GAE, the clipped PPO update — compiles into a single XLA
program; scenes shard over the ``scene`` mesh axis and policy layers may
shard over ``model`` (parallel/mesh.py).  Gradients cross scene shards via
compiler-inserted psums on ICI; there are no host round trips.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from img_env_tpu.core.state import Observation
from img_env_tpu.models.policy import CrowdNavPolicy, PolicyConfig, sample_action
from img_env_tpu.parallel.batched_env import BatchedNavEnv


class PpoConfig(NamedTuple):
    unroll: int = 8             # env steps per update
    gamma: float = 0.99
    lam: float = 0.95
    clip: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def obs_features(obs: Observation, use_ped: bool):
    """Flatten [S,N,...] observation into the policy's [B,...] inputs."""
    sm = obs.sensor_maps
    s, n = sm.shape[0], sm.shape[1]
    b = s * n
    sm = sm.reshape(b, 1, sm.shape[-2], sm.shape[-1])
    vs = obs.vector_states.reshape(b, -1)
    if use_ped:
        pm = obs.ped_maps.reshape(b, 3, obs.ped_maps.shape[-2], obs.ped_maps.shape[-1])
        pv = obs.ped_vector_states.reshape(b, -1)
    else:
        pm = pv = None
    return sm, vs, pm, pv


def make_train_step(
    env: BatchedNavEnv,
    model: CrowdNavPolicy,
    cfg: PpoConfig = PpoConfig(),
    tx: Optional[optax.GradientTransformation] = None,
):
    """Returns (init_fn(params), train_step(ts, states, obs, key))."""
    tx = tx or optax.adam(cfg.lr)
    use_ped = env.cfg.ped_sim.total > 0
    ranges = env.cfg.continuous_actions
    n_rob = env.cfg.robot.total

    def init_fn(params) -> TrainState:
        return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    def _dist(params, feats):
        return model.apply(params, *feats)

    def rollout(params, states, obs, key):
        def body(carry, key):
            states, obs = carry
            feats = obs_features(obs, use_ped)
            dist = _dist(params, feats)
            k_act, _ = jax.random.split(key)
            act, logp, value = sample_action(k_act, dist, ranges)
            act_sn = act.reshape(-1, n_rob, act.shape[-1])
            actions = jnp.concatenate(
                [act_sn, jnp.zeros(act_sn.shape[:-1] + (1,))], -1)
            states, nobs, reward, done, _ = env.step_fn(states, actions)
            out = (feats, act, logp, value, reward.reshape(-1), done.reshape(-1))
            return (states, nobs), out

        keys = jax.random.split(key, cfg.unroll)
        (states, obs), traj = jax.lax.scan(body, (states, obs), keys)
        return states, obs, traj

    def gae(values, rewards, dones, last_value):
        def body(carry, xs):
            adv_next, v_next = carry
            v, r, d = xs
            nonterm = 1.0 - (d > 0).astype(jnp.float32)
            delta = r + cfg.gamma * v_next * nonterm - v
            adv = delta + cfg.gamma * cfg.lam * nonterm * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value),
            (values, rewards, dones), reverse=True,
        )
        return advs

    def loss_fn(params, traj, last_value):
        feats, act, logp_old, value_old, reward, done = traj
        advs = gae(value_old, reward, done, last_value)
        returns = advs + value_old
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        def per_step(f, a):
            d = _dist(params, f)
            mean, log_std, value = d
            logp = (-0.5 * ((a - mean) / jnp.exp(log_std)) ** 2
                    - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
            ent = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1)
            return logp, ent, value

        logp, ent, value = jax.vmap(per_step)(feats, act)
        ratio = jnp.exp(logp - logp_old)
        pg = -jnp.minimum(
            ratio * advs,
            jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * advs,
        ).mean()
        vf = 0.5 * ((value - returns) ** 2).mean()
        loss = pg + cfg.vf_coef * vf - cfg.ent_coef * ent.mean()
        return loss, {"pg_loss": pg, "vf_loss": vf, "entropy": ent.mean(),
                      "reward_mean": reward.mean()}

    def train_step(ts: TrainState, states, obs, key):
        k_roll, k_loss = jax.random.split(key)
        states, obs, traj = rollout(ts.params, states, obs, k_roll)
        feats_last = obs_features(obs, use_ped)
        dist_last = _dist(ts.params, feats_last)
        last_value = dist_last[-1]
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, traj, last_value)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics["loss"] = loss
        return TrainState(params, opt_state, ts.step + 1), states, obs, metrics

    return init_fn, train_step
