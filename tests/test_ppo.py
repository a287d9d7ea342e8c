"""PPO update mechanics + convergence smoke (reward improves on easy task)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.models.policy import PolicyConfig, init_policy
from img_env_tpu.parallel.batched_env import BatchedNavEnv
from img_env_tpu.train.ppo import PpoConfig, make_train_step


def _easy_cfg(scenes=4):
    """Empty 10 m map, 1 robot, no peds — learn 'drive at the goal'."""
    return EnvConfig.from_dict({
        "robot": {
            "total": 1,
            "begin_poses_type": ["range"], "begin_poses": [[2.0, 8.0, 2.0, 8.0]],
            "target_poses_type": ["range"], "target_poses": [[2.0, 8.0, 2.0, 8.0]],
        },
        "ped_sim": {"total": 0},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.1, "width": 3.0, "height": 3.0},
        "range_total": 24,
        "image_size": [48, 48],
        "time_max": 40,
        "num_scenes": scenes,
    })


def _setup(scenes=4, unroll=16, seed=0, ppo=None):
    cfg = _easy_cfg(scenes)
    env = BatchedNavEnv(cfg, mesh=None, jit=False)
    pcfg = PolicyConfig.from_env_config(cfg)
    model, params = init_policy(jax.random.PRNGKey(seed), pcfg, batch=scenes)
    init_fn, train_step = make_train_step(
        env, model, ppo or PpoConfig(unroll=unroll, lr=1e-3))
    ts = init_fn(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), scenes)
    states, obs = jax.jit(env.reset_fn)(keys)
    return ts, states, obs, jax.jit(train_step)


def test_minibatched_epochs_update_params():
    ts, states, obs, step = _setup(scenes=2, unroll=4)
    ts2, states, obs, m = step(ts, states, obs, jax.random.PRNGKey(0))
    assert int(ts2.step) == 1
    assert np.isfinite(float(m["loss"]))
    # epochs * minibatches SGD steps happened; params moved
    delta = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                        jax.tree_util.tree_leaves(ts2.params)))
    assert delta > 0.0


def test_gradient_clipping_bounds_update():
    """clip_by_global_norm + sgd(1): the parameter step's global norm is
    bounded by max_grad_norm (Adam would renormalize and hide the clip)."""
    import optax

    clip = 1e-3
    cfg = _easy_cfg(2)
    env = BatchedNavEnv(cfg, mesh=None, jit=False)
    pcfg = PolicyConfig.from_env_config(cfg)
    model, params = init_policy(jax.random.PRNGKey(0), pcfg, batch=2)
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.sgd(1.0))
    init_fn, train_step = make_train_step(
        env, model, PpoConfig(unroll=4, epochs=1, minibatches=1), tx=tx)
    ts = init_fn(params)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    states, obs = jax.jit(env.reset_fn)(keys)
    ts2, *_ = jax.jit(train_step)(ts, states, obs, jax.random.PRNGKey(2))
    sq = sum(
        float(((np.asarray(a) - np.asarray(b)) ** 2).sum())
        for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                        jax.tree_util.tree_leaves(ts2.params)))
    assert np.sqrt(sq) <= clip * 1.01


@pytest.mark.slow
def test_reward_improves_on_empty_map():
    """Mean rollout (paper) reward improves over ~40 updates: the dense
    200*step_d progress term teaches 'drive at the goal' on an empty map."""
    ts, states, obs, step = _setup(
        scenes=6, unroll=16, seed=7,
        ppo=PpoConfig(unroll=16, lr=1e-3, epochs=2, minibatches=2))
    rewards = []
    key = jax.random.PRNGKey(42)
    for u in range(40):
        key, k = jax.random.split(key)
        ts, states, obs, m = step(ts, states, obs, k)
        rewards.append(float(m["reward_mean"]))
    early = np.mean(rewards[:8])
    late = np.mean(rewards[-8:])
    assert late > early, f"no improvement: early {early:.1f} late {late:.1f}"


def test_checkpoint_roundtrip_deterministic_eval(tmp_path):
    """train_ppo --save / evaluate --policy ckpt contract: params survive an
    orbax round-trip and the deterministic mean policy emits in-range
    actions on raw observations."""
    from img_env_tpu.train import checkpoint as ckpt_mod

    ts, states, obs, step = _setup(scenes=2, unroll=4)
    ts, states, obs, _ = step(ts, states, obs, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck")
    ckpt_mod.save(path, {"params": jax.device_get(ts.params)})

    cfg = _easy_cfg(2)
    from img_env_tpu.models.policy import PolicyConfig, init_policy

    pcfg = PolicyConfig.from_env_config(cfg)
    _, params0 = init_policy(jax.random.PRNGKey(0), pcfg, batch=1)
    restored = ckpt_mod.restore(path, like={"params": params0})
    model, _ = init_policy(jax.random.PRNGKey(0), pcfg, batch=1)

    sm = obs.sensor_maps.reshape(-1, 1, *obs.sensor_maps.shape[-2:])
    vs = obs.vector_states.reshape(sm.shape[0], -1)
    mean, log_std, value = model.apply(restored["params"], sm, vs, None, None)
    ranges = cfg.continuous_actions
    act = np.clip(np.asarray(mean),
                  [r[0] for r in ranges], [r[1] for r in ranges])
    assert np.isfinite(act).all()
    assert act.shape == (sm.shape[0], 2)
    # round-trip really restored the trained params, not the init
    leaves_a = jax.tree_util.tree_leaves(restored["params"])
    leaves_b = jax.tree_util.tree_leaves(ts.params)
    assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))
