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
from img_env_tpu.models.policy import CrowdNavPolicy, sample_action
from img_env_tpu.parallel.batched_env import BatchedNavEnv


class PpoConfig(NamedTuple):
    unroll: int = 8             # env steps per update
    gamma: float = 0.99
    lam: float = 0.95
    clip: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    epochs: int = 4             # passes over the rollout per update
    minibatches: int = 4        # shuffled minibatches per epoch
    max_grad_norm: float = 0.5  # global-norm gradient clip
    reward: str = "paper"       # 'paper' (SensorsPaperReward) | 'base'
    reward_scale: float = 1.0   # scales rewards entering GAE/returns only
                                #   (paper rewards span +-500; the value
                                #   loss otherwise dwarfs the policy loss).
                                #   Reported reward_mean stays UNscaled.
    autoreset: bool = True      # NeverStop: re-draw finished scenes between
                                #   rollouts (all robots down or time_max)


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
    tx = tx or optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )
    use_ped = env.cfg.ped_sim.total > 0
    # configs may carry a third (v_y / omni) range; the Gaussian head emits
    # act_dim values, so clip only those
    ranges = env.cfg.continuous_actions[: env.cfg.act_dim]
    n_rob = env.cfg.robot.total

    def init_fn(params) -> TrainState:
        return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    def _dist(params, feats):
        return model.apply(params, *feats)

    ped_safety = float(env.cfg.ped_safety_space)
    time_max = int(env.cfg.time_max)

    def rollout(params, states, obs, key):
        """Unroll with training-stack semantics: dense paper reward
        (SensorsPaperRewardWrapper), rewards of already-done robots masked
        (MultiRobotCleanWrapper's is_clean), finished scenes re-drawn after
        the rollout (NeverStopWrapper)."""
        from img_env_tpu.env import rewards as rewards_mod

        def body(carry, key):
            states, obs = carry
            feats = obs_features(obs, use_ped)
            dist = _dist(params, feats)
            k_act, _ = jax.random.split(key)
            # store the RAW Gaussian sample for the loss: clipping only the
            # env command keeps logp_old consistent with the logp the
            # minibatch loss recomputes (clip-then-logp biases the ratio
            # and lets the mean run away through the clip)
            act, logp, value = sample_action(k_act, dist, None)
            lo = jnp.asarray([r[0] for r in ranges])
            hi = jnp.asarray([r[1] for r in ranges])
            act_env = jnp.clip(act, lo, hi)
            act_sn = act_env.reshape(-1, n_rob, act_env.shape[-1])
            actions = jnp.concatenate(
                [act_sn, jnp.zeros(act_sn.shape[:-1] + (1,))], -1)
            states, nobs, reward, done, info = env.step_fn(states, actions)
            if cfg.reward == "paper":
                d = nobs.vector_states.shape[-1]
                reward = rewards_mod.paper_reward(
                    nobs.vector_states.reshape(-1, d),
                    nobs.is_collisions.reshape(-1),
                    nobs.is_arrives.reshape(-1),
                    nobs.step_ds.reshape(-1),
                    nobs.ped_min_dists.reshape(-1),
                    ped_safety,
                ).reshape(reward.shape)
            reward = jnp.where(info["alive"], reward, 0.0)   # is_clean mask
            out = (feats, act, logp, value,
                   reward.reshape(-1).astype(value.dtype),
                   done.reshape(-1))
            return (states, nobs), out

        k_steps, k_reset = jax.random.split(key)
        keys = jax.random.split(k_steps, cfg.unroll)
        (states, obs), traj = jax.lax.scan(body, (states, obs), keys)

        # episode outcome rates at the end of the unroll, BEFORE scenes
        # re-draw (the TestEpisodeWrapper-style learning curve signal)
        ep_stats = {
            "arrive_rate": states.robots.arrive.astype(jnp.float32).mean(),
            "collision_rate": jnp.clip(
                states.robots.collision, 0, 1).astype(jnp.float32).mean(),
        }

        if cfg.autoreset:
            # NeverStop between rollouts: scenes with every robot down or
            # past the time limit restart from a fresh key
            done_now = (jnp.clip(states.robots.collision, 0, 1)
                        + states.robots.arrive.astype(jnp.int32)) > 0
            finished = done_now.all(axis=-1) | (states.step >= time_max)
            s_batch = states.step.shape[0]
            rkeys = jax.random.split(k_reset, s_batch)
            rstates, robs = env.reset_fn(rkeys)

            def _iskey(x):
                return jnp.issubdtype(x.dtype, jax.dtypes.prng_key)

            def pick(new, old):
                if _iskey(new) or _iskey(old):
                    # typed PRNG-key leaves (the multi-process path builds
                    # scene keys via wrap_key_data) have no jnp.where —
                    # select on the raw key data; the carry (``old``) may
                    # be typed while the fresh reset keys are raw uint32,
                    # so keep the carry's storage flavor
                    kn = jax.random.key_data(new) if _iskey(new) else new
                    ko = jax.random.key_data(old) if _iskey(old) else old
                    mk = finished.reshape((s_batch,) + (1,) * (kn.ndim - 1))
                    out = jnp.where(mk, kn, ko)
                    if _iskey(old):
                        return jax.random.wrap_key_data(
                            out, impl=jax.random.key_impl(
                                old if _iskey(old) else new))
                    return out
                m = finished.reshape(
                    (s_batch,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            states = jax.tree_util.tree_map(pick, rstates, states)
            obs = jax.tree_util.tree_map(pick, robs, obs)
        return states, obs, traj, ep_stats

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

    def minibatch_loss(params, mb):
        """Clipped PPO loss on one shuffled minibatch [MB, ...]."""
        feats, act, logp_old, advs, returns = mb
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        mean, log_std, value = _dist(params, feats)
        logp = (-0.5 * ((act - mean) / jnp.exp(log_std)) ** 2
                - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
        ent = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1)
        ratio = jnp.exp(logp - logp_old)
        pg = -jnp.minimum(
            ratio * advs,
            jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * advs,
        ).mean()
        vf = 0.5 * ((value - returns) ** 2).mean()
        loss = pg + cfg.vf_coef * vf - cfg.ent_coef * ent.mean()
        return loss, {"pg_loss": pg, "vf_loss": vf, "entropy": ent.mean()}

    def train_step(ts: TrainState, states, obs, key):
        """One PPO update: unroll -> GAE -> epochs x shuffled minibatches of
        clipped updates with global-norm gradient clipping."""
        k_roll, k_perm = jax.random.split(key)
        states, obs, traj, ep_stats = rollout(ts.params, states, obs, k_roll)
        feats, act, logp_old, value_old, reward, done = traj
        feats_last = obs_features(obs, use_ped)
        last_value = _dist(ts.params, feats_last)[-1]
        advs = gae(value_old, reward * cfg.reward_scale, done, last_value)
        returns = advs + value_old

        # flatten [T, B, ...] -> [T*B, ...]
        flat = lambda x: (x.reshape((-1,) + x.shape[2:])
                          if x is not None else None)
        data = (tuple(flat(f) for f in feats), flat(act), flat(logp_old),
                flat(advs), flat(returns))
        tb = data[1].shape[0]
        n_mb = max(1, min(cfg.minibatches, tb))
        mb_size = tb // n_mb
        take = lambda x, idx: (None if x is None else x[idx])

        def epoch_body(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, tb)
            idxs = perm[: mb_size * n_mb].reshape(n_mb, mb_size)

            def mb_body(carry, idx):
                params, opt_state = carry
                mb = (tuple(take(f, idx) for f in data[0]),
                      *(take(x, idx) for x in data[1:]))
                (loss, m), grads = jax.value_and_grad(
                    minibatch_loss, has_aux=True)(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                m["loss"] = loss
                return (params, opt_state), m

            (params, opt_state), ms = jax.lax.scan(
                mb_body, (params, opt_state), idxs)
            return (params, opt_state), ms

        keys = jax.random.split(k_perm, cfg.epochs)
        (params, opt_state), ms = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state), keys)
        metrics = {k: v.mean() for k, v in ms.items()}
        metrics["reward_mean"] = reward.mean()
        metrics.update(ep_stats)
        return TrainState(params, opt_state, ts.step + 1), states, obs, metrics

    return init_fn, train_step
