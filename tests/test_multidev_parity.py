"""Cross-shard observation parity at production sensor semantics.

The reference's scene parallelism is one ROS node per scene
(create_launch.py:25-34); here S scenes step as one mesh-sharded XLA
program (parallel/batched_env.py).  Two claims, separately tested:

1. Sharding must not change the sensor pipeline by a single bit: the
   batched program run with an 8-device scene-sharded mesh is compared
   BITWISE against the same batched program on one device, through the
   PARITY sensor pipeline (XLA path) with a live ORCA crowd, on
   sensor_maps / lasers / angular_maps / collision / arrive.  The
   float64 vector fields (vector_states, ped_*, step_ds) may move at
   the last-ULP level (~1e-15, measured) because SPMD partitioning
   changes the lowering of their trig/reduction chains — asserted to
   1e-12.
2. Batching (vmap) must not change semantics: per-scene unbatched runs
   must agree exactly on every integer/bool surface and to float32
   round-off on the real-valued maps (XLA lowers vmapped dots with a
   different accumulation order, so the interpolated view maps can move
   by one ULP — outcome-bearing surfaces may not move at all).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.parallel.batched_env import BatchedNavEnv
from img_env_tpu.parallel.mesh import make_mesh

S = 8
STEPS = 3

OBS_FIELDS = ("sensor_maps", "lasers", "vector_states",
              "ped_vector_states", "ped_maps", "is_collisions",
              "is_arrives", "step_ds", "angular_maps")
# the rendered-sensor surfaces + outcome codes: bit-exact across sharding
BITEXACT_SHARD_FIELDS = ("sensor_maps", "lasers", "angular_maps",
                         "is_collisions", "is_arrives")
EXACT_FIELDS = ("is_collisions", "is_arrives")   # int/bool outcome codes


def _cfg():
    return EnvConfig.from_dict({
        "robot": {"total": 2,
                  "begin_poses_type": ["range"],
                  "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                  "target_poses_type": ["range"],
                  "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "object": {"total": 3, "shape": ["rectangle"],
                   "size_range": [[0.1, 0.4, 0.1, 0.4]],
                   "poses_type": ["range"], "poses": [[2.0, 8.0, 2.0, 8.0]]},
        "ped_sim": {"total": 2, "type": "rvoscene", "max_speed": [0.5],
                    "begin_poses_type": ["range"],
                    "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                    "target_poses_type": ["range"],
                    "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "range_total": 64,
        "max_ped": 2,
        "sensor_mode": "parity",
    })


def _run_batched(cfg, mesh, keys, actions):
    benv = BatchedNavEnv(cfg, mesh=mesh)
    ctx = mesh if mesh is not None else jax.default_device(jax.devices()[0])
    with ctx:
        states, obs = benv.reset(keys)
        seq = [obs]
        for _ in range(STEPS):
            states, obs, rew, done, info = benv.step(states, actions)
            seq.append(obs)
    return seq


def test_sharded_scenes_bitmatch_single_device():
    """Claim 1: the 8-way scene-sharded run == the one-device run —
    bitwise on every rendered-sensor surface, 1e-12 on float64 vectors."""
    if len(jax.devices()) < S:
        pytest.skip(f"needs {S} devices")
    cfg = _cfg()
    keys = jax.random.split(jax.random.PRNGKey(7), S)
    actions = jnp.tile(jnp.asarray([[0.4, 0.3, 0.0], [0.5, -0.2, 0.0]]),
                       (S, 1, 1))
    sharded = _run_batched(cfg, make_mesh(scene=S, model=1), keys, actions)
    single = _run_batched(cfg, None, keys, actions)
    for t, (got, want) in enumerate(zip(sharded, single)):
        for field in OBS_FIELDS:
            g = np.asarray(getattr(got, field))
            w = np.asarray(getattr(want, field))
            if field in BITEXACT_SHARD_FIELDS:
                assert np.array_equal(g, w), (
                    f"step {t} field {field}: sharded run differs from "
                    f"single-device ({np.sum(g != w)} mismatches)")
            else:
                assert np.allclose(g, w, rtol=0, atol=1e-12), (
                    f"step {t} field {field}: max err "
                    f"{np.max(np.abs(g - w))}")


def test_batched_scenes_match_unbatched():
    """Claim 2: vmapped scenes == per-scene unbatched runs (exact on
    outcome surfaces; float32 round-off on interpolated maps)."""
    if len(jax.devices()) < S:
        pytest.skip(f"needs {S} devices")
    cfg = _cfg()
    keys = jax.random.split(jax.random.PRNGKey(7), S)
    actions = jnp.tile(jnp.asarray([[0.4, 0.3, 0.0], [0.5, -0.2, 0.0]]),
                       (S, 1, 1))
    batched = _run_batched(cfg, make_mesh(scene=S, model=1), keys, actions)

    env = NavEnv(cfg)
    for s in range(S):
        state, obs = env.reset(keys[s])
        seq = [obs]
        for _ in range(STEPS):
            state, obs, rew, done, info = env.step_fn(
                state, actions[s], env.sensor_tables)
            seq.append(obs)
        for t, (got_b, want) in enumerate(zip(batched, seq)):
            for field in OBS_FIELDS:
                g = np.asarray(getattr(got_b, field)[s])
                w = np.asarray(getattr(want, field))
                if field in EXACT_FIELDS or g.dtype.kind in "ib":
                    assert np.array_equal(g, w), (
                        f"scene {s} step {t} field {field}: "
                        f"{np.sum(g != w)} mismatches")
                else:
                    assert np.allclose(g, w, rtol=0, atol=1e-6), (
                        f"scene {s} step {t} field {field}: max err "
                        f"{np.max(np.abs(g - w))}")
