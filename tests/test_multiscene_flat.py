"""Flat multi-scene sensor path vs the legacy vmap-the-whole-step path.

BatchedNavEnv's default path runs the sensor pipeline flat over all S*N
robots (NavEnv._sensor_pass / _observe_multi) — the multi-scene
throughput fix (VERDICT r3 #2).  It must not change a single bit of any
observation surface vs vmapping the single-scene step (legacy_vmap=True),
including the auto-reset carry semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.parallel.batched_env import BatchedNavEnv

S = 4
STEPS = 3

OBS_FIELDS = ("sensor_maps", "lasers", "vector_states",
              "ped_vector_states", "ped_maps", "is_collisions",
              "is_arrives", "step_ds", "ped_min_dists", "angular_maps",
              "hit_points")


def _cfg(peds=2, scene="pedscene", use_laser=True):
    d = {
        "robot": {"total": 2,
                  "begin_poses_type": ["range"],
                  "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                  "target_poses_type": ["range"],
                  "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "object": {"total": 3, "shape": ["rectangle"],
                   "size_range": [[0.1, 0.4, 0.1, 0.4]],
                   "poses_type": ["range"], "poses": [[2.0, 8.0, 2.0, 8.0]]},
        "ped_sim": {"total": peds, "type": scene, "max_speed": [0.5],
                    "shape": ["leg"], "size": [[0.0, 0.1, 0.1]],
                    "begin_poses_type": ["range"],
                    "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                    "target_poses_type": ["range"],
                    "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "range_total": 64,
        "max_ped": 3,
        "use_laser": use_laser,
        "sensor_mode": "parity",
    }
    if peds == 0:
        d["ped_sim"] = {"total": 0, "type": ""}
    return EnvConfig.from_dict(d)


def _run(cfg, legacy):
    env = BatchedNavEnv(cfg, mesh=None, legacy_vmap=legacy)
    keys = jax.random.split(jax.random.PRNGKey(3), S)
    states, obs = env.reset(keys)
    seq = [obs]
    actions = jnp.tile(jnp.asarray([[0.4, 0.3, 0.0], [0.5, -0.2, 0.0]]),
                       (S, 1, 1))[:, : cfg.robot.total]
    for _ in range(STEPS):
        states, obs, rew, done, info = env.step(states, actions)
        seq.append(obs)
    # carry-threaded re-reset (auto-reset semantics): vw_last1 / gait
    # state must persist identically on both paths
    states2, obs2 = env.reset(jax.random.split(jax.random.PRNGKey(9), S),
                              carry=states)
    seq.append(obs2)
    return seq


@pytest.mark.parametrize("peds,scene,use_laser", [
    (2, "pedscene", True),
    (2, "rvoscene", True),
    (0, "", True),
    (2, "pedscene", False),
])
def test_flat_bitmatches_legacy(peds, scene, use_laser):
    cfg = _cfg(peds, scene, use_laser)
    flat = _run(cfg, legacy=False)
    legacy = _run(cfg, legacy=True)
    for t, (got, want) in enumerate(zip(flat, legacy)):
        for field in OBS_FIELDS:
            g = np.asarray(getattr(got, field))
            w = np.asarray(getattr(want, field))
            assert g.shape == w.shape, (t, field, g.shape, w.shape)
            assert np.array_equal(g, w), (
                f"step {t} field {field}: flat path differs "
                f"({np.sum(g != w)} mismatches, max "
                f"{np.max(np.abs(g.astype(np.float64) - w.astype(np.float64)))})")
