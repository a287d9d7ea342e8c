"""Episode recording, deterministic replay, sim-state checkpointing.

The reference's persistence story (SURVEY.md §5) has two halves, both via
rosbag:
  * init-pose bags — record N episode scenarios so different methods see
    identical resets (yaml_env.py:268-294, 333-358);
  * EpRes bags — full per-episode pose/velocity histories for offline
    analysis (img_env.cpp:527-545, envs/utils/bag/bag.py).

Here both collapse to arrays:
  * ``ScenarioBank`` stores the PRNG keys (and optionally the sampled
    scenario pytree) — an episode is a pure function of its key, so replay
    is exact by construction;
  * ``EpisodeRecorder`` accumulates per-step state on the host (outside the
    jitted hot path) and saves npz;
  * ``save_state``/``load_state`` snapshot a whole ``WorldState`` pytree —
    sim-state checkpoint/resume the reference lacks.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


class ScenarioBank:
    """Fixed episode scenarios as stored PRNG keys (init-pose-bag analogue)."""

    def __init__(self, keys: Optional[np.ndarray] = None):
        self.keys = np.zeros((0, 2), np.uint32) if keys is None else np.asarray(keys)

    @staticmethod
    def generate(seed: int, episodes: int) -> "ScenarioBank":
        root = jax.random.PRNGKey(seed)
        keys = jax.random.split(root, episodes)
        return ScenarioBank(np.asarray(keys))

    def __len__(self) -> int:
        return self.keys.shape[0]

    def key(self, episode: int):
        import jax.numpy as jnp

        return jnp.asarray(self.keys[episode % len(self)])

    def save(self, path: str) -> None:
        np.savez(path, keys=self.keys)

    @staticmethod
    def load(path: str) -> "ScenarioBank":
        with np.load(path) as z:
            return ScenarioBank(z["keys"])


@dataclasses.dataclass
class EpisodeRecord:
    """One episode's histories (EpRes message analogue, msg/EpRes.msg)."""

    robot_poses: List[np.ndarray] = dataclasses.field(default_factory=list)
    robot_vws: List[np.ndarray] = dataclasses.field(default_factory=list)
    ped_poses: List[np.ndarray] = dataclasses.field(default_factory=list)
    rewards: List[np.ndarray] = dataclasses.field(default_factory=list)
    goals: Optional[np.ndarray] = None      # [N,2] episode goals
    dones_info: Optional[np.ndarray] = None
    result: str = ""

    def arrays(self) -> Dict[str, np.ndarray]:
        return {
            "robot_poses": np.asarray(self.robot_poses),   # [T,N,3]
            "robot_vws": np.asarray(self.robot_vws),       # [T,N,2]
            "ped_poses": np.asarray(self.ped_poses),       # [T,M,2]
            "rewards": np.asarray(self.rewards),           # [T,N]
        }


class EpisodeRecorder:
    """Accumulates episode records host-side; save/load npz; computes the
    BagReader-style summary (arrival rate, extra time/distance)."""

    def __init__(self, dt: float = 0.4):
        self.dt = dt
        self.episodes: List[EpisodeRecord] = []
        self._cur: Optional[EpisodeRecord] = None

    def start_episode(self) -> None:
        self._cur = EpisodeRecord()
        self.episodes.append(self._cur)

    def add_step(self, state, reward=None, speeds=None) -> None:
        if self._cur is None:
            self.start_episode()
        if self._cur.goals is None and hasattr(state.robots, "goal"):
            self._cur.goals = np.asarray(state.robots.goal)
        self._cur.robot_poses.append(np.asarray(state.robots.pose))
        if speeds is not None:
            self._cur.robot_vws.append(np.asarray(speeds))
        else:
            self._cur.robot_vws.append(np.asarray(state.robots.vw_last0))
        self._cur.ped_poses.append(np.asarray(state.peds.pos))
        if reward is not None:
            self._cur.rewards.append(np.asarray(reward))

    def end_episode(self, dones_info=None, result: str = "") -> None:
        if self._cur is not None:
            if dones_info is not None:
                self._cur.dones_info = np.asarray(dones_info)
            self._cur.result = result
        self._cur = None

    # ------------------------------------------------------------------
    def summary(self, v_max: float = 0.6) -> Dict[str, float]:
        """BagReader-style stats (bag.py:897-1040): arrival rate, avg path
        time/distance, avg |v|/|w|, and the extra time/distance beyond the
        straight start->goal optimum (the reference's extra-time at v_max
        0.6 m/s and extra-distance measures)."""
        eps = [e for e in self.episodes if e.robot_poses]
        if not eps:
            return {}
        arrive = sum(
            1 for e in eps
            if e.dones_info is not None and np.any(np.asarray(e.dones_info) == 5)
        )
        times, dists, vs, ws = [], [], [], []
        extra_t, extra_d = [], []
        for e in eps:
            poses = np.asarray(e.robot_poses)   # [T,N,3]
            t_ep = poses.shape[0] * self.dt
            times.append(t_ep)
            seg = np.linalg.norm(np.diff(poses[:, :, :2], axis=0), axis=-1)
            path = seg.sum(0) if poses.shape[0] > 1 else np.zeros(poses.shape[1])
            dists.append(float(path.mean()))
            if e.goals is not None:
                straight = np.linalg.norm(
                    np.asarray(e.goals) - poses[0, :, :2], axis=-1)
                extra_d.append(float((path - straight).mean()))
                extra_t.append(float((t_ep - straight / v_max).mean()))
            vws = np.asarray(e.robot_vws)
            if vws.size:
                vs.append(float(np.abs(vws[..., 0]).mean()))
                ws.append(float(np.abs(vws[..., 1]).mean()))
        return {
            "episodes": float(len(eps)),
            "arrive_rate": arrive / len(eps),
            "avg_path_time": float(np.mean(times)),
            "avg_distance": float(np.mean(dists)),
            "avg_extra_time": float(np.mean(extra_t)) if extra_t else 0.0,
            "avg_extra_distance": float(np.mean(extra_d)) if extra_d else 0.0,
            "avg_abs_v": float(np.mean(vs)) if vs else 0.0,
            "avg_abs_w": float(np.mean(ws)) if ws else 0.0,
        }

    def save(self, path: str) -> None:
        payload: Dict[str, Any] = {"n_episodes": len(self.episodes), "dt": self.dt}
        arrays = {}
        for i, e in enumerate(self.episodes):
            for k, v in e.arrays().items():
                arrays[f"ep{i}_{k}"] = v
            if e.goals is not None:
                arrays[f"ep{i}_goals"] = e.goals
            if e.dones_info is not None:
                arrays[f"ep{i}_dones_info"] = e.dones_info
        np.savez_compressed(path, meta=json.dumps(payload), **arrays)

    @staticmethod
    def load(path: str) -> "EpisodeRecorder":
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            rec = EpisodeRecorder(dt=meta["dt"])
            for i in range(meta["n_episodes"]):
                e = EpisodeRecord()
                if f"ep{i}_robot_poses" in z:
                    e.robot_poses = list(z[f"ep{i}_robot_poses"])
                    e.robot_vws = list(z[f"ep{i}_robot_vws"])
                    e.ped_poses = list(z[f"ep{i}_ped_poses"])
                    e.rewards = list(z[f"ep{i}_rewards"])
                if f"ep{i}_goals" in z:
                    e.goals = z[f"ep{i}_goals"]
                if f"ep{i}_dones_info" in z:
                    e.dones_info = z[f"ep{i}_dones_info"]
                rec.episodes.append(e)
            return rec


# ---------------------------------------------------------------------------
# WorldState checkpointing
# ---------------------------------------------------------------------------


def save_state(path: str, state) -> None:
    """Snapshot any pytree of arrays (WorldState, TrainState, ...) to npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path,
        treedef=str(treedef),
        **{f"leaf{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_state(path: str, like):
    """Restore a snapshot into the structure of ``like`` (shape-checked)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as z:
        new = []
        for i, ref in enumerate(leaves):
            arr = z[f"leaf{i}"]
            if hasattr(ref, "shape") and tuple(arr.shape) != tuple(ref.shape):
                raise ValueError(
                    f"leaf {i}: snapshot shape {arr.shape} != expected {ref.shape}")
            new.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new)
