"""Drop-in gym-style facade mirroring the reference's user API.

``make_env(cfg)`` accepts the reference's yaml path / dict / EnvConfig and
returns an object with the familiar surface:

    env = make_env("envs/cfg/test.yaml")
    state = env.reset()                      # ObsStateTmp-style list or state
    state, rewards, dones, info = env.step(actions)

Internally everything runs through the jitted NavEnv; this wrapper only
converts to numpy at the boundary and implements the stateful conveniences
(auto-reset, episode metrics) that the reference provides via Gym wrappers
(envs/__init__.py:24-33, envs/wrapper/*).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.config import EnvConfig, read_yaml
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.env.wrappers import StackedObs, WrapperStack
from img_env_tpu.utils.metrics import EpisodeMetrics


class _FlatBatchedCore:
    """NavEnv-shaped facade over BatchedNavEnv: [S,N,...] <-> [S*N,...]."""

    def __init__(self, batched, scenes: int):
        self._env = batched
        self._s = scenes
        self._n = batched.cfg.robot.total

    def _flat(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((self._s * self._n,) + x.shape[2:])
            if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == self._s
            else x,
            tree,
        )

    def reset(self, key, carry=None):
        keys = jax.random.split(key, self._s)
        # carry threads through exactly like the single-scene path
        # (nav_env.reset_state_fn: vw_last1 / gait phase persist across
        # auto-resets)
        state, obs = self._env.reset(keys, carry)
        return state, self._flat(obs)

    def step(self, state, cmds):
        actions = jnp.asarray(cmds).reshape(self._s, self._n, -1)
        state, obs, reward, done, info = self._env.step(state, actions)
        return (state, self._flat(obs), reward.reshape(-1),
                done.reshape(-1), self._flat(info))


class ImgNavEnv:
    """Stateful environment with the reference's step contract.

    ``cfg.num_scenes > 1`` replaces the reference's one-ROS-node-per-scene
    fan-out (``env_num``, create_launch.py:25-34): S independent scenes step
    as one on-device program and their robots flatten into a single
    ``[S*N]`` batch, so the whole wrapper surface works unchanged.
    Auto-reset (NeverStop) then triggers when ALL scenes are down.
    """

    def __init__(self, cfg: EnvConfig, seed: int = 0, record: bool = False):
        self.cfg = cfg
        self.scenes = max(int(cfg.num_scenes), 1)
        if self.scenes > 1:
            from img_env_tpu.parallel.batched_env import BatchedNavEnv

            self.core = _FlatBatchedCore(BatchedNavEnv(cfg), self.scenes)
        else:
            self.core = NavEnv(cfg)
        self.stack = WrapperStack(cfg, n_robots=cfg.robot.total * self.scenes)
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._ws = None
        self.robot_total = cfg.robot.total * self.scenes
        self.ped_total = cfg.ped_sim.total * self.scenes
        self.metrics = EpisodeMetrics(cfg)
        self._obs_filter = self._pick_filter(cfg)
        # TimeControlWrapper (base.py:301-311): wall-clock pacing, eval only
        self._pace = "TimeControlWrapper" in set(cfg.wrapper or ())
        self._last_step_t = None
        # BagRecordWrapper analogue: host-side episode recording
        self.recorder = None
        if record or "BagRecordWrapper" in set(cfg.wrapper or ()):
            from img_env_tpu.eval.recorder import EpisodeRecorder

            self.recorder = EpisodeRecorder(dt=float(cfg.control_hz))
        # cfg_type 'bag': fixed-scenario replay (yaml_env.py:126-130,234-244)
        # — every method sees the same episode sequence.  A ScenarioBank npz
        # is loaded if present, otherwise generated (and saved when named).
        self.scenario_bank = None
        self._episode_idx = 0
        if cfg.cfg_type == "bag":
            import os

            from img_env_tpu.eval.recorder import ScenarioBank

            name = cfg.init_pose_bag_name
            if name and os.path.exists(name):
                self.scenario_bank = ScenarioBank.load(name)
            else:
                self.scenario_bank = ScenarioBank.generate(
                    seed, max(int(cfg.init_pose_bag_episodes), 1))
                if name:
                    self.scenario_bank.save(name)
        # PedTrajectoryDatasetWrapper surface: config-driven ETH/UCY replay.
        # The csv loads once; every world is prebuilt PADDED TO ONE COMMON
        # LENGTH so world changes never recompile the jitted reset.  Worlds
        # advance every ``repeated_time_per_env`` episodes and cycle (the
        # reference sys.exit()s after the last world,
        # PedTrajectoryDatasetWrapper.py:49-52).
        self._dataset_worlds = None
        self._dataset_episode = 0
        if cfg.ped_traj_dataset:
            if self.scenes > 1:
                raise ValueError(
                    "ped_traj_dataset replay is single-scene (the reference "
                    "wrapper drives one env; see PedTrajectoryDatasetWrapper)")
            from img_env_tpu.datasets.pedestrians import (
                PedDatasetConfig,
                build_world_arrays,
                load_trajectory_csv,
            )

            table = load_trajectory_csv(cfg.ped_traj_dataset)
            dcfg = PedDatasetConfig(
                swapxy=cfg.ped_dataset_swapxy,
                offset=tuple(cfg.ped_dataset_offset),
                fps=int(cfg.ped_dataset_fps),
                control_hz=float(cfg.control_hz),
                start_t=float(cfg.ped_dataset_start_t),
                max_time=float(cfg.ped_dataset_max_time),
                scale_x=float(cfg.ped_dataset_scale[0]),
                scale_y=float(cfg.ped_dataset_scale[1]),
            )
            spans = [(int(s), int(e)) for s, e in cfg.ped_dataset_worlds]
            raw = [build_world_arrays(table, s, e - s + 1, dcfg,
                                      pad_peds=cfg.ped_sim.total)
                   for s, e in spans]
            tmax = max(a[0].shape[1] for a in raw)
            self._dataset_worlds = [
                build_world_arrays(table, s, e - s + 1, dcfg,
                                   pad_peds=cfg.ped_sim.total, pad_time=tmax)
                for s, e in spans
            ]

    @staticmethod
    def _pick_filter(cfg: EnvConfig):
        w = set(cfg.wrapper)
        if "ObsLaserStateTmp" in w:
            return "laser"
        if "ObsStateTmp" in w:
            return "image"
        return None

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _filtered(self, sobs: StackedObs):
        if self._obs_filter == "laser":
            return [
                np.asarray(sobs.lasers),
                np.asarray(sobs.vector_states),
                np.asarray(sobs.raw.ped_maps),
            ]
        if self._obs_filter == "image":
            return [
                np.asarray(sobs.sensor_maps),
                np.asarray(sobs.vector_states),
                np.asarray(sobs.raw.ped_maps),
            ]
        return sobs

    def reset(self, **kwargs):
        carry = self._state if kwargs.get("carry", True) and self._state is not None else None
        key = kwargs.get("key", None)
        if key is None:
            if self.scenario_bank is not None:
                key = self.scenario_bank.key(self._episode_idx)
                self._episode_idx += 1
            else:
                key = self._next_key()
        if self._dataset_worlds is not None:
            per = max(int(self.cfg.repeated_time_per_env), 1)
            wi = (self._dataset_episode // per) % len(self._dataset_worlds)
            self._dataset_episode += 1
            self._state, obs = self.core.reset(
                key, carry, dataset=self._dataset_worlds[wi])
        else:
            self._state, obs = self.core.reset(key, carry)
        self.last_raw_obs = obs   # unfiltered Observation (policy consumers)
        if self._ws is None:
            self._ws = self.stack.init_state()
        self._ws, sobs = self.stack.on_reset(self._ws, obs)
        if self.recorder is not None:
            self.recorder.start_episode()
        return self._filtered(sobs)

    def step(self, actions):
        from img_env_tpu.env.wrappers import vel_action_map

        if self.stack.use_vel_action:
            cmds, speeds = vel_action_map(self.cfg, jnp.asarray(actions))
        else:
            cmds = jnp.asarray(actions, jnp.float32).reshape(self.robot_total, -1)
            if cmds.shape[-1] < 3:
                cmds = jnp.concatenate(
                    [cmds, jnp.zeros((self.robot_total, 3 - cmds.shape[-1]))], -1
                )
            speeds = cmds[:, :2]
        self._state, obs, reward, done, info = self.core.step(self._state, cmds)
        self.last_raw_obs = obs   # unfiltered Observation (policy consumers)
        info = dict(info)
        info["speeds"] = speeds
        self._ws, sobs, reward, done, info = self.stack.on_step(
            self._ws, obs, reward, done, info
        )
        np_info = {k: np.asarray(v) for k, v in info.items()}
        self.metrics.add_step(np_info)
        if self.recorder is not None:
            self.recorder.add_step(self._state, reward=np.asarray(reward),
                                   speeds=np.asarray(speeds))
        if self._pace:
            # TimeControlWrapper: enforce >= control_hz wall-clock per step
            import time as _time

            now = _time.perf_counter()
            if self._last_step_t is not None:
                remain = float(self.cfg.control_hz) - (now - self._last_step_t)
                if remain > 0:
                    _time.sleep(remain)
            self._last_step_t = _time.perf_counter()

        if self.stack.use_never_stop and bool(np.asarray(info["all_down"])):
            self.metrics.end_episode(np_info["dones_info"])
            if self.recorder is not None:
                self.recorder.end_episode(np_info["dones_info"])
            obs_out = self.reset()
        else:
            obs_out = self._filtered(sobs)
        return obs_out, np.asarray(reward), np.asarray(done), np_info


class WrappedFrontend:
    """Wrapper stack composed over a hardware/external frontend.

    The reference applies the yaml ``wrapper:`` list to EVERY env_type
    (envs/__init__.py:30-32), so GazeboEnv/RealEnv get action mapping,
    paper reward, time limit, frame stacking and eval metrics exactly like
    the simulator.  This class lifts the single-robot frontend's dict
    observation into the batched ``Observation`` pytree the functional
    stack consumes (the reference's GazeboEnv likewise returns a full
    ``ImageState``, gazebo_env.py:251-282).
    """

    def __init__(self, frontend, cfg: EnvConfig):
        self.env = frontend             # raw frontend stays reachable
        self.cfg = cfg
        self.stack = WrapperStack(cfg, n_robots=1)
        self.metrics = EpisodeMetrics(cfg)
        self._ws = None
        self._obs_filter = ImgNavEnv._pick_filter(cfg)
        self._prev_dist: Optional[float] = None

    # gazebo_env.py:251-282: frontends report one robot; lift to [1, ...]
    def _to_observation(self, d: Dict[str, Any], dones_info) -> "Observation":
        from img_env_tpu.core.state import Observation

        vec = jnp.asarray(d["vector_states"], jnp.float32)
        dist = float(np.hypot(float(vec[0, 0]), float(vec[0, 1])))
        step_d = 0.0 if self._prev_dist is None else self._prev_dist - dist
        self._prev_dist = dist
        pv = np.asarray(d["ped_vector_states"], np.float32)
        # nearest-ped clearance = dist - (r + robot_r) of the closest track
        # (yaml_env.py:455 via NearbyPed; inf when no peds, reset_helper.py:92)
        min_d = float(pv[0, 7] - pv[0, 6]) if pv[0, 0] > 0 else float("inf")
        di = int(np.asarray(dones_info).reshape(-1)[0])
        h, w = self.cfg.image_size
        # sensor_maps: the frontend's image when provided (image_last,
        # real_env.py:139 / gazebo_env.py:258), else synthesized from the
        # scan (the reference's _trans_lidar_log_map alternative) — image
        # policy checkpoints deploy through this facade either way.
        if "sensor_maps" in d:
            sm = jnp.asarray(d["sensor_maps"], jnp.float32).reshape(1, h, w)
        elif "lasers" in d:
            from img_env_tpu.utils.lidar import trans_lidar_log_map

            # frontends normalize lasers (norm_lasers); the log-polar map
            # wants raw ranges in meters
            scan = np.asarray(d["lasers"], np.float32).reshape(-1)
            if self.cfg.laser_norm:
                scan = scan * float(self.cfg.laser_max)
            sm = jnp.asarray(trans_lidar_log_map(scan, length=h),
                             jnp.float32).reshape(1, h, w)
        else:
            sm = jnp.zeros((1, h, w), jnp.float32)
        return Observation(
            vector_states=vec,
            sensor_maps=sm,
            is_collisions=jnp.asarray(
                [1 if di in (1, 2, 3) else 0], jnp.int32),
            is_arrives=jnp.asarray([1 if di == 5 else 0], jnp.int32),
            lasers=jnp.asarray(d["lasers"], jnp.float32),
            ped_vector_states=jnp.asarray(pv),
            ped_maps=jnp.asarray(d["ped_maps"], jnp.float32),
            step_ds=jnp.asarray([step_d], jnp.float32),
            ped_min_dists=jnp.asarray([min_d], jnp.float32),
        )

    def reset(self):
        d = self.env.reset()
        self._prev_dist = None
        if self._ws is None:
            self._ws = self.stack.init_state()
        obs = self._to_observation(d, np.zeros(1))
        self._ws, sobs = self.stack.on_reset(self._ws, obs)
        return self._filtered(sobs)

    _filtered = ImgNavEnv._filtered

    def step(self, actions):
        from img_env_tpu.env.wrappers import vel_action_map

        if self.stack.use_vel_action:
            raw = jnp.asarray(actions)
            raw = raw.reshape(-1) if self.cfg.discrete_action \
                else raw.reshape(1, -1)
            cmds, speeds = vel_action_map(self.cfg, raw)
            cmd = np.asarray(cmds).reshape(-1, cmds.shape[-1])[0]
            speeds = speeds.reshape(1, -1)
        else:
            cmd = np.asarray(actions, np.float32).reshape(-1)
            speeds = jnp.asarray(cmd[:2], jnp.float32)[None]
        d, reward, done, info = self.env.step(cmd)
        info = dict(info)
        dones_info = np.asarray(
            info.get("dones_info", np.zeros(1))).reshape(1)
        obs = self._to_observation(d, dones_info)
        reward = jnp.asarray(np.asarray(reward, np.float32).reshape(1))
        done = jnp.asarray(np.asarray(done, np.int32).reshape(1))
        info["dones_info"] = jnp.asarray(dones_info.astype(np.int32))
        info["speeds"] = speeds
        self._ws, sobs, reward, done, info = self.stack.on_step(
            self._ws, obs, reward, done, info)
        np_info = {k: np.asarray(v) for k, v in info.items()
                   if not callable(v)}
        self.metrics.add_step(np_info)
        if self.stack.use_never_stop and bool(np.asarray(info["all_down"])):
            self.metrics.end_episode(np_info["dones_info"])
            obs_out = self.reset()
        else:
            obs_out = self._filtered(sobs)
        return obs_out, np.asarray(reward), np.asarray(done), np_info


def make_env(cfg: Union[str, dict, EnvConfig], seed: int = 0, **kw):
    """Reference-style factory (envs/__init__.py:24-33): dispatch on
    ``env_type`` — 'robot_nav' -> simulator, 'real_env' -> hardware facade.
    The yaml ``wrapper:`` list composes over every frontend, as in the
    reference (envs/__init__.py:30-32); pass ``wrap=False`` for the bare
    hardware/external facade."""
    if isinstance(cfg, str):
        cfg = EnvConfig.from_dict(read_yaml(cfg))
    elif isinstance(cfg, dict):
        cfg = EnvConfig.from_dict(cfg)
    wrap = kw.pop("wrap", True)
    if cfg.env_type == "real_env":
        from img_env_tpu.env.hardware_env import HardwareEnv

        env = HardwareEnv(cfg, **kw)
        return WrappedFrontend(env, cfg) if wrap and cfg.wrapper else env
    if cfg.env_type == "gazebo_env":
        from img_env_tpu.env.external_env import ExternalSimEnv

        if "transport" not in kw:
            raise ValueError(
                "env_type 'gazebo_env' needs a transport= keyword: an "
                "ExternalSimTransport bundling the simulator callbacks "
                "(scan, model state, cmd, contact — the gazebo_env.py "
                "service surface). A rospy bridge is a few lines host-side.")
        env = ExternalSimEnv(cfg, **kw)
        return WrappedFrontend(env, cfg) if wrap and cfg.wrapper else env
    return ImgNavEnv(cfg, seed=seed, **kw)
