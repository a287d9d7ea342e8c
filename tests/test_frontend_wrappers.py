"""Wrapper stack composed over the hardware/external frontends.

The reference applies the yaml ``wrapper:`` list to EVERY env_type
(envs/__init__.py:30-32) — GazeboEnv/RealEnv get action mapping, paper
reward, time limit and eval metrics like the simulator.  These tests drive
``make_env(env_type=...)`` through the composed ``WrappedFrontend``.
"""

import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.external_env import ExternalSimTransport
from img_env_tpu.env.gymapi import WrappedFrontend, make_env

from tests.test_external_env import MockSim


WRAPPERS = [
    "VelActionWrapper",
    "TimeLimitWrapper",
    "SensorsPaperRewardWrapper",
    "InfoLogWrapper",
    "StateBatchWrapper",
    "ObsLaserStateTmp",
    "NeverStopWrapper",
]


def _gazebo_env(sim, target=(0.0, 8.0), time_max=3, peds=False):
    cfg = EnvConfig.from_dict({
        "robot": {"total": 1},
        "ped_sim": {"total": 0},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "env_type": "gazebo_env",
        "range_total": sim.n_beams,
        "robot_radius": 0.17,
        "start_global_pose": [0.0, 0.0, 0.0],
        "target_global_pose": list(target),
        "wrapper": WRAPPERS,
        "time_max": time_max,
        "continuous_actions": [[0.0, 0.6], [-0.9, 0.9]],
    })
    t = ExternalSimTransport(
        get_scan=sim.get_scan, get_model_state=sim.get_model_state,
        set_model_state=sim.set_model_state, send_cmd=sim.send_cmd,
        get_contact=sim.get_contact,
        get_peds=sim.get_peds if peds else None)
    env = make_env(cfg, transport=t)
    assert isinstance(env, WrappedFrontend)
    env.env.real_time = False
    return env


def test_gazebo_paper_reward_step_penalty():
    """Stationary robot, no peds: paper reward is exactly the -5 step cost."""
    env = _gazebo_env(MockSim())
    env.reset()
    obs, r, done, info = env.step([0.0, 0.0])
    assert abs(float(r[0]) - (-5.0)) < 1e-5
    assert int(info["dones_info"][0]) == 0
    # ObsLaserStateTmp filter: [lasers, vector_states, ped_maps]
    assert isinstance(obs, list) and len(obs) == 3


def test_gazebo_timeout_dones_info_10_and_autoreset():
    env = _gazebo_env(MockSim(), time_max=3)
    env.reset()
    codes = []
    for _ in range(4):
        obs, r, done, info = env.step([0.0, 0.0])
        codes.append(int(info["dones_info"][0]))
    assert codes == [0, 0, 0, 10]
    # NeverStop auto-reset ran and the eval metrics recorded a stuck episode
    assert env.metrics.stuck == 1
    # elapsed counter restarted
    obs, r, done, info = env.step([0.0, 0.0])
    assert int(info["dones_info"][0]) == 0


def test_gazebo_collision_reward():
    sim = MockSim()
    env = _gazebo_env(sim, time_max=50)
    env.reset()
    r_last, code = 0.0, 0
    for _ in range(30):
        obs, r, done, info = env.step([0.6, 0.0])
        if int(info["dones_info"][0]) > 0:
            r_last, code = float(r[0]), int(info["dones_info"][0])
            break
    assert code == 1 and r_last == -500.0


def test_gazebo_ped_proximity_penalty():
    """Tracked ped at 1.41 m: clearance 0.64 < 0.7 -> -50*(0.7-d) extra."""
    env = _gazebo_env(MockSim(), peds=True)
    env.reset()
    obs, r, done, info = env.step([0.0, 0.0])
    d = np.hypot(1.0, 1.0) - (0.3 * 2 + 0.17)
    expect = -5.0 - 50.0 * (0.7 - d)
    assert abs(float(r[0]) - expect) < 1e-4


def test_real_env_wrapped_arrival():
    cfg = EnvConfig.from_dict({
        "robot": {"total": 1},
        "ped_sim": {"total": 0},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "env_type": "real_env",
        "range_total": 90,
        "robot_radius": 0.17,
        "wrapper": WRAPPERS,
        "control_hz": 0.01,
        "continuous_actions": [[0.0, 0.6], [-0.9, 0.9]],
    })
    env = make_env(cfg)
    assert isinstance(env, WrappedFrontend)
    hw = env.env
    hw.feed_pose(0.0, 0.0, 0.0)
    hw.set_goal(0.1, 0.0)
    env.reset()
    obs, r, done, info = env.step([0.0, 0.0])
    assert int(info["dones_info"][0]) == 5
    assert float(r[0]) == 500.0
    assert env.metrics.arrive == 0  # degenerate (<=3 step) episodes skipped
