"""Ped-map overwrite kernel vs the XLA sorted decode (interpret mode).

The kernel's sortless winner rule (lex-max of (range^2, index) among
covering peds) must equal the reference semantics the XLA path implements:
range-sorted draw order with later (farther) peds overwriting
(yaml_env.py:392-458).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.env import observe
from img_env_tpu.ops.pallas_pedmap import ped_map_pallas


@pytest.mark.parametrize("trial", range(3))
def test_pedmap_kernel_matches_xla(rng, trial):
    n, m = 5, 23
    poses = jnp.asarray(
        np.column_stack([rng.uniform(1, 9, (n, 2)),
                         rng.uniform(-np.pi, np.pi, n)]), jnp.float32)
    ped_pos = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    ped_vel = jnp.asarray(rng.uniform(-1, 1, (m, 2)), jnp.float32)
    ped_r = jnp.full((m,), 0.1, jnp.float32)
    rob_r = jnp.full((n,), 0.17, jnp.float32)

    px, py, vx, vy = observe.peds_in_base(poses, ped_pos, ped_vel)
    got = ped_map_pallas(px.astype(jnp.float32), py.astype(jnp.float32),
                         vx.astype(jnp.float32), vy.astype(jnp.float32),
                         res=6.0 / 48, ped_image_r=0.25, image_size=48,
                         interpret=True)
    _, want, _ = observe.ped_vectors_and_map(
        poses, ped_pos, ped_vel, ped_r, rob_r, 10, 7, 48, 0.25)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want, np.float32))


def test_pedmap_kernel_overwrite_ties(rng):
    """Two peds at the same position: the larger ORIGINAL index must win
    (stable argsort keeps original order among equal ranges, and the
    later sorted ped overwrites)."""
    n = 2
    poses = jnp.asarray([[5.0, 5.0, 0.3], [4.0, 6.0, -1.0]], jnp.float32)
    ped_pos = jnp.asarray([[5.5, 5.2]] * 2 + [[4.4, 6.1]], jnp.float32)
    ped_vel = jnp.asarray([[0.1, 0.2], [0.3, -0.4], [0.0, 0.5]], jnp.float32)
    ped_r = jnp.full((3,), 0.1, jnp.float32)
    rob_r = jnp.full((n,), 0.17, jnp.float32)

    px, py, vx, vy = observe.peds_in_base(poses, ped_pos, ped_vel)
    got = ped_map_pallas(px.astype(jnp.float32), py.astype(jnp.float32),
                         vx.astype(jnp.float32), vy.astype(jnp.float32),
                         res=6.0 / 48, ped_image_r=0.25, image_size=48,
                         interpret=True)
    _, want, _ = observe.ped_vectors_and_map(
        poses, ped_pos, ped_vel, ped_r, rob_r, 10, 7, 48, 0.25)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want, np.float32))


def test_pedmap_backend_param_through_env_shapes(rng):
    """map_backend='pallas' (interpret off-TPU is exercised by the kernel
    tests above; here we check the top_k vector path) returns identical
    ped VECTORS and min-dists to the argsort path."""
    n, m = 4, 17
    poses = jnp.asarray(
        np.column_stack([rng.uniform(1, 9, (n, 2)),
                         rng.uniform(-np.pi, np.pi, n)]))
    ped_pos = jnp.asarray(rng.uniform(0, 10, (m, 2)))
    ped_vel = jnp.asarray(rng.uniform(-1, 1, (m, 2)))
    ped_r = jnp.asarray(rng.uniform(0.05, 0.3, m).round(2))
    rob_r = jnp.full((n,), 0.17)
    vec_x, _, min_x = observe.ped_vectors_and_map(
        poses, ped_pos, ped_vel, ped_r, rob_r, 10, 7, 48, 0.25)
    px, py, vx, vy = observe.peds_in_base(poses, ped_pos, ped_vel)
    # vector path only: compare the top_k ordering against the full argsort
    import jax.numpy as jnp2

    rs = px * px + py * py
    k = min(m, 10)
    _, ord_k = jax.lax.top_k(-rs, k)
    order = jnp2.argsort(rs, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ord_k), np.asarray(order))
