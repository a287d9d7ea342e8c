"""Device-mesh sharding: scene data-parallelism + model tensor-parallelism."""

from img_env_tpu.parallel.batched_env import BatchedNavEnv, rollout_with_obs
from img_env_tpu.parallel.mesh import (
    MODEL_AXIS,
    SCENE_AXIS,
    host_mesh,
    make_mesh,
    scene_sharding,
    shard_scenes,
    tp_param_shardings,
)

__all__ = [
    "BatchedNavEnv",
    "rollout_with_obs",
    "MODEL_AXIS",
    "SCENE_AXIS",
    "host_mesh",
    "make_mesh",
    "scene_sharding",
    "shard_scenes",
    "tp_param_shardings",
]
