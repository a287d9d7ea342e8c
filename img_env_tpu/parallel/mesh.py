"""Device-mesh construction and sharding specs.

The reference's only parallelism is one ROS node process per scene
(create_launch.py:25-34).  Here a scene is just a batch index: the whole
step is one SPMD program and scenes shard over the ``scene`` (data-parallel)
mesh axis, with an optional ``model`` axis for tensor-parallel policy layers.

Within a pod slice the collectives ride ICI; across hosts
``jax.distributed.initialize`` extends the same mesh over DCN — no per-step
host round trips anywhere (vs the reference's per-step ROS RPC,
yaml_env.py:360-377).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENE_AXIS = "scene"
MODEL_AXIS = "model"


def make_mesh(
    scene: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a [scene, model] mesh over the available devices.

    ``scene=None`` uses all remaining devices for the scene axis.
    """
    devs = list(devices if devices is not None else jax.devices())
    if scene is None:
        scene = len(devs) // model
    if scene * model != len(devs):
        devs = devs[: scene * model]
    arr = np.asarray(devs).reshape(scene, model)
    return Mesh(arr, (SCENE_AXIS, MODEL_AXIS))


def scene_spec(extra_dims: int = 0) -> P:
    """PartitionSpec sharding the leading scene axis, replicating the rest."""
    return P(SCENE_AXIS, *([None] * extra_dims))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(SCENE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scenes(mesh: Mesh, tree):
    """Constrain every array leaf of a scene-batched pytree to shard dim 0."""
    sh = NamedSharding(mesh, P(SCENE_AXIS))

    def _c(x):
        return jax.lax.with_sharding_constraint(x, sh) if hasattr(x, "ndim") and x.ndim >= 1 else x

    return jax.tree_util.tree_map(_c, tree)


def tp_param_shardings(params, mesh: Mesh):
    """Tensor-parallel NamedShardings for a flax param tree.

    Dense/conv kernels whose output feature dim divides the ``model`` axis
    size shard that dim; biases replicate.  With model=1 everything
    replicates (pure data parallel).
    """
    size = mesh.shape[MODEL_AXIS]

    def spec_for(path, x):
        if x.ndim >= 2 and x.shape[-1] % size == 0 and size > 1:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def host_mesh(n: int) -> Mesh:
    """CPU mesh for tests (XLA_FLAGS=--xla_force_host_platform_device_count)."""
    return make_mesh(scene=n, model=1, devices=jax.devices()[:n])
