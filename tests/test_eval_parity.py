"""Batched evaluator == sequential facade, bit-for-bit (one trusted
evaluator).

The scene-batched evaluator (eval/batched_eval.py) is the production
evaluation path (evaluate.py --batch, the experiment matrix).  This test
pins its semantics to the sequential wrapper-stack loop the reference
models (TestEpisodeWrapper + init-pose bags, SURVEY.md §4): same
ScenarioBank, same deterministic policy, identical per-robot dones_info —
including the InfoLogWrapper arrive-over-collision priority and the
TimeLimitWrapper `elapsed > time_max` timeout step (base.py:215-254).
"""

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.constants import DONE_TIMEOUT
from img_env_tpu.env.gymapi import make_env
from img_env_tpu.eval.batched_eval import evaluate_batched
from img_env_tpu.eval.recorder import ScenarioBank

EPISODES = 6
TIME_MAX = 14


def _cfg_dict():
    return {
        "env_name": "eval_parity",
        "control_hz": 0.4,
        "time_max": TIME_MAX,
        "state_dim": 3,
        "act_dim": 2,
        "discrete_action": False,
        "continuous_actions": [[0, 0.6], [-0.9, 0.9], [-0.6, 0.6]],
        "max_ped": 2,
        "range_total": 32,
        "wrapper": [
            "VelActionWrapper", "TimeLimitWrapper",
            "SensorsPaperRewardWrapper", "InfoLogWrapper",
            "MultiRobotCleanWrapper", "StateBatchWrapper",
        ],
        "robot": {
            "total": 2,
            "shape": ["circle"],
            "size": [[0.0, 0.0, 0.17]],
            "begin_poses_type": ["range"],
            "begin_poses": [[1.5, 8.5, 1.5, 8.5]],
            "target_poses_type": ["range"],
            "target_poses": [[1.5, 8.5, 1.5, 8.5]],
        },
        "object": {
            "total": 2,
            "shape": ["circle"],
            "size_range": [[0.15, 0.25]],
            "poses_type": ["range"],
            "poses": [[2.0, 8.0, 2.0, 8.0]],
        },
        "ped_sim": {
            "total": 2,
            "type": "pedscene",
            "max_speed": [0.5],
            "shape": ["circle"],
            "size": [[0.0, 0.0, 0.17]],
            "begin_poses_type": ["range"],
            "begin_poses": [[1.5, 8.5, 1.5, 8.5]],
            "target_poses_type": ["range"],
            "target_poses": [[1.5, 8.5, 1.5, 8.5]],
            "go_back": "yes",
        },
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
        "target_min_dist": 2.0,
    }


def _p_control(vec):
    """Deterministic P-controller on the goal-in-base state — a pure
    elementwise function of the observation, so both evaluators compute
    identical actions given identical observations."""
    bx, by = vec[..., 0], vec[..., 1]
    v = jnp.clip(0.8 * bx, 0.0, 0.6)
    w = jnp.clip(2.0 * jnp.arctan2(by, jnp.maximum(bx, 1e-6)), -0.9, 0.9)
    return jnp.stack([v, w], -1)


def test_batched_equals_sequential(tmp_path):
    bank_path = str(tmp_path / "bank.npz")
    ScenarioBank.generate(3, EPISODES).save(bank_path)

    # -- sequential: the gym facade with the full wrapper stack ----------
    d = _cfg_dict()
    d["cfg_type"] = "bag"
    d["init_pose_bag_name"] = bank_path
    d["init_pose_bag_episodes"] = EPISODES
    env = make_env(d, seed=0)
    n = env.robot_total
    seq_dones = np.zeros((EPISODES, n), np.int64)
    for ep in range(EPISODES):
        env.reset(carry=False)
        info = None
        for _ in range(TIME_MAX + 1):
            actions = np.asarray(_p_control(env.last_raw_obs.vector_states))
            _, _, _, info = env.step(actions)
            if bool(np.asarray(info["all_down"])):
                break
        di = np.asarray(info["dones_info"]).reshape(-1)
        # the sequential loop can exhaust its budget with robots still
        # running (all_down never fired); the trusted label is timeout —
        # exactly what TimeLimitWrapper produces one step later
        di = np.where(di == 0, DONE_TIMEOUT, di)
        seq_dones[ep] = di

    # -- batched: every bank episode is a scene --------------------------
    cfg = EnvConfig.from_dict(_cfg_dict())
    bank = ScenarioBank.load(bank_path)

    def policy(key, obs):
        return _p_control(obs.vector_states)

    summary, bat_dones = evaluate_batched(
        cfg, policy, EPISODES, bank=bank)

    assert bat_dones.shape == seq_dones.shape
    np.testing.assert_array_equal(bat_dones, seq_dones)
    # every episode produced a real outcome code
    assert set(np.unique(bat_dones)) <= {1, 2, 3, 5, 10}
    assert summary["episodes"] == EPISODES


def test_batched_evaluator_mpc_and_recorder():
    """The matrix driver's paths through the trusted evaluator: the MPC
    controller rides the scene axis, and record=True emits an
    EpisodeRecorder whose per-scene episodes carry poses/goals/dones."""
    import pytest

    pytest.importorskip("jax")
    from img_env_tpu.mpc import MppiConfig

    cfg = EnvConfig.from_dict(_cfg_dict())
    bank = ScenarioBank.generate(5, 3)
    summary, dones, rec = evaluate_batched(
        cfg, None, 3, bank=bank, mpc=MppiConfig(horizon=4, samples=16),
        record=True)
    assert dones.shape == (3, 2)
    assert set(np.unique(dones)) <= {1, 2, 3, 5, 10}
    assert summary["episodes"] == 3
    assert "ped_min_dist_mean" in summary
    assert len(rec.episodes) == 3
    ep = rec.episodes[0]
    assert ep.goals.shape == (2, 2)
    assert ep.dones_info.shape == (2,)
    assert len(ep.robot_poses) >= 1
    assert np.asarray(ep.robot_vws[0]).shape == (2, 2)
