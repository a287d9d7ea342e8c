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
    """Megatron-style tensor-parallel NamedShardings for a flax param tree.

    Alternating column/row sharding over the ``model`` axis so activations
    STAY sharded through each pair and GSPMD inserts one psum per pair
    (instead of all-gathering after every layer):

      * column (output-dim) sharded: conv kernels, trunk projections, the
        first layer of each MLP pair (``fuse0``/``vec0``/``embed``) — their
        biases shard the same dim;
      * row (input-dim) sharded: the second layer of each pair
        (``fuse1``/``vec1``/``mlp``) — its matmul contracts the sharded
        activation locally, then the compiler psums; bias replicates;
      * heads (value / pi_mean / pi_logits) and everything else replicate.

    With model=1 everything replicates (pure data parallel).  Dims that
    don't divide the axis size fall back to replication.
    """
    size = mesh.shape[MODEL_AXIS]
    row_names = ("fuse1", "vec1", "mlp")

    def spec_for(path, x):
        if size <= 1:
            return NamedSharding(mesh, P())
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_row = any(n in row_names for n in names)
        is_kernel = names and names[-1] == "kernel"
        if is_kernel and in_row and x.ndim == 2 and x.shape[0] % size == 0:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        if x.ndim >= 2 and not in_row and x.shape[-1] % size == 0:
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), MODEL_AXIS))
        if (names and names[-1] == "bias" and not in_row
                and x.ndim == 1 and x.shape[0] % size == 0):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_sharded_fraction(params, shardings) -> float:
    """Fraction of parameter BYTES actually sharded over the model axis."""
    leaves = jax.tree_util.tree_leaves(params)
    specs = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda s: isinstance(s, NamedSharding))
    total = sharded = 0
    for x, s in zip(leaves, specs):
        n = int(np.prod(x.shape)) if x.ndim else 1
        total += n
        if any(p is not None for p in s.spec):
            sharded += n
    return sharded / max(total, 1)


def host_mesh(n: int) -> Mesh:
    """CPU mesh for tests (XLA_FLAGS=--xla_force_host_platform_device_count)."""
    return make_mesh(scene=n, model=1, devices=jax.devices()[:n])
