"""Wrapper-stack semantics + gym facade."""

import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.constants import DONE_ARRIVE, DONE_TIMEOUT
from img_env_tpu.core.state import Observation
from img_env_tpu.env import wrappers as W

from tests.test_env_smoke import _small_cfg


def _fake_obs(n=2, coll=(0, 0), arr=(0, 0), step_ds=(0.1, 0.2), ped_min=(5.0, 0.5)):
    return Observation(
        vector_states=jnp.asarray([[1.0, 1.0, 0.0]] * n),
        sensor_maps=jnp.zeros((n, 48, 48)),
        is_collisions=jnp.asarray(coll, jnp.int32),
        is_arrives=jnp.asarray(arr, jnp.int32),
        lasers=jnp.zeros((n, 96)),
        ped_vector_states=jnp.zeros((n, 29)),
        ped_maps=jnp.zeros((n, 3, 48, 48)),
        step_ds=jnp.asarray(step_ds),
        ped_min_dists=jnp.asarray(ped_min),
    )


def test_paper_reward_values():
    cfg = _small_cfg()
    obs = _fake_obs(coll=(1, 0), arr=(0, 0), step_ds=(0.1, 0.2), ped_min=(5.0, 0.5))
    r = np.asarray(W.paper_reward_wrapper(cfg, obs, None))
    assert r[0] == -500.0
    # robot 1: proximity -50*(0.7-0.5) + 200*0.2 - 5
    np.testing.assert_allclose(r[1], -50 * 0.2 + 200 * 0.2 - 5, atol=1e-5)


def test_paper_reward_reach():
    cfg = _small_cfg()
    obs = _fake_obs(coll=(0, 0), arr=(1, 0))
    obs = obs._replace(vector_states=jnp.asarray([[0.1, 0.1, 0.0], [3.0, 0.0, 0.0]]))
    r = np.asarray(W.paper_reward_wrapper(cfg, obs, None))
    assert r[0] == 500.0


def test_time_limit_and_info_log():
    cfg = _small_cfg().replace(time_max=3)
    ws = W.init_wrapper_state(cfg)
    done = jnp.zeros(2, jnp.int32)
    obs = _fake_obs(coll=(2, 0), arr=(0, 1))
    info = {"dones_info": jnp.zeros(2, jnp.int32)}
    for step in range(5):
        ws, done_o, di = W.time_limit_wrapper(cfg, ws, done, info["dones_info"])
        info["dones_info"] = di
    assert np.asarray(done_o).min() == 1  # exceeded time_max
    assert np.asarray(info["dones_info"]).min() == DONE_TIMEOUT
    info = W.info_log_wrapper(cfg, obs, done_o, info)
    # collisions/arrivals override timeout codes
    assert np.asarray(info["dones_info"])[0] == 2
    assert np.asarray(info["dones_info"])[1] == DONE_ARRIVE
    assert bool(np.asarray(info["all_down"]))


def test_multi_robot_clean_masks_rewards():
    cfg = _small_cfg()
    ws = W.init_wrapper_state(cfg)
    reward = jnp.asarray([1.0, 2.0])
    speeds = jnp.ones((2, 2))
    done = jnp.asarray([1, 0])
    ws, r, s, info = W.multi_robot_clean_wrapper(ws, reward, speeds, done, {})
    np.testing.assert_array_equal(np.asarray(r), [1.0, 2.0])  # first step still clean
    ws, r2, s2, _ = W.multi_robot_clean_wrapper(ws, reward, speeds, done, {})
    np.testing.assert_array_equal(np.asarray(r2), [0.0, 2.0])  # now masked


def test_state_batch_stacking():
    cfg = _small_cfg().replace(image_batch=2, state_batch=3, laser_batch=0)
    ws = W.init_wrapper_state(cfg)
    obs = _fake_obs()
    ws, imgs, vecs, lasers = W.state_batch_push(cfg, ws, obs)
    assert imgs.shape == (2, 2, 48, 48)
    assert vecs.shape == (2, 9)
    # zero-padded at start: first two state frames are zeros
    np.testing.assert_array_equal(np.asarray(vecs[:, :6]), 0.0)
    ws, imgs, vecs, lasers = W.state_batch_push(cfg, ws, obs)
    assert np.asarray(vecs[:, 3:]).any()


def test_vel_action_discrete():
    cfg = _small_cfg().replace(
        discrete_action=True,
        discrete_actions=((0.0, -0.9), (0.2, 0.0), (0.6, 0.9)),
    )
    cmds, speeds = W.vel_action_map(cfg, jnp.asarray([2, 0]))
    np.testing.assert_allclose(np.asarray(cmds), [[0.6, 0.9, 0.0], [0.0, -0.9, 0.0]])


def test_vel_action_continuous_clip():
    cfg = _small_cfg().replace(
        discrete_action=False, continuous_actions=((0.0, 0.6), (-0.9, 0.9)),
    )
    cmds, _ = W.vel_action_map(cfg, jnp.asarray([[2.0, -3.0], [-1.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(cmds[:, :2]), [[0.6, -0.9], [0.0, 0.5]])


def test_gym_facade_runs():
    from img_env_tpu import make_env

    cfg = _small_cfg(n_ped=2, n_rob=2).replace(
        wrapper=(
            "VelActionWrapper", "TimeLimitWrapper", "SensorsPaperRewardWrapper",
            "InfoLogWrapper", "MultiRobotCleanWrapper", "StateBatchWrapper",
            "ObsLaserStateTmp", "NeverStopWrapper",
        ),
        discrete_action=False,
        time_max=5,
    )
    env = make_env(cfg)
    obs = env.reset()
    assert isinstance(obs, list) and len(obs) == 3
    for i in range(8):  # runs past time_max -> auto-reset exercised
        obs, rew, done, info = env.step(np.asarray([[0.3, 0.1], [0.3, -0.1]]))
        assert "dones_info" in info and "speeds" in info
    assert env.metrics.episodes >= 1


def test_num_scenes_flat_batch():
    """cfg.num_scenes > 1: S scenes flatten into one [S*N] robot batch
    through the full gym facade (reference env_num parity)."""
    import numpy as np
    from img_env_tpu.config import read_yaml
    from img_env_tpu.env.gymapi import make_env

    d = read_yaml("img_env_tpu/configs/test.yaml")
    d["num_scenes"] = 3
    env = make_env(d, seed=1)
    obs = env.reset()
    n = env.robot_total
    assert n == 3 * d["robot"]["total"]
    assert np.asarray(obs[1]).shape[0] == n
    for i in range(3):
        obs, r, done, info = env.step(np.full((n,), 10, np.int32))
    assert np.asarray(r).shape == (n,)
    assert info["dones_info"].shape == (n,)


def test_cfg_type_bag_replay(tmp_path):
    """cfg_type 'bag': two env instances replay identical scenarios
    (the reference's init-pose-bag A/B protocol, yaml_env.py:234-244)."""
    import numpy as np
    from img_env_tpu.config import read_yaml
    from img_env_tpu.env.gymapi import make_env

    d = read_yaml("img_env_tpu/configs/test.yaml")
    d["cfg_type"] = "bag"
    d["init_pose_bag_name"] = str(tmp_path / "bank.npz")
    d["init_pose_bag_episodes"] = 3

    obs_a = [make_env(d, seed=0).reset() for _ in range(1)][0]
    env_b = make_env(d, seed=123)          # different seed, same bank file
    obs_b = env_b.reset()
    np.testing.assert_array_equal(np.asarray(obs_a[1]), np.asarray(obs_b[1]))
    # successive resets walk the bank deterministically
    second_b = env_b.reset(carry=False)
    assert not np.array_equal(np.asarray(obs_b[1]), np.asarray(second_b[1]))
