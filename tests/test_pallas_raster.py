"""Block one-hot raster kernel vs the XLA scatters (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.ops import raster
from img_env_tpu.ops.footprint import circle_points, rectangle_points
from img_env_tpu.ops.pallas_raster import max_footprint_span, robot_maps_pallas

RES = 0.05
HW = (150, 150)


def _scene(rng, n=6):
    clouds = []
    for i in range(n):
        if i % 2:
            a, b = rng.uniform(0.05, 0.2, 2)
            clouds.append(rectangle_points(-a, a, -b, b))
        else:
            clouds.append(circle_points(0, 0, rng.uniform(0.1, 0.3)))
    pmax = max(c.shape[0] for c in clouds)
    pts = np.zeros((n, pmax, 2), np.float32)
    msk = np.zeros((n, pmax), bool)
    for i, c in enumerate(clouds):
        pts[i, : c.shape[0]] = c
        msk[i, : c.shape[0]] = True
    poses = np.stack([rng.uniform(0.5, 7.0, n), rng.uniform(0.5, 7.0, n),
                      rng.uniform(-3.14, 3.14, n)], -1)
    # force overlaps + a map-edge straddler
    poses[1, :2] = poses[0, :2] + 0.05
    poses[2] = [0.05, 7.4, 0.2]
    return pts, msk, poses


@pytest.mark.parametrize("trial", range(3))
def test_raster_kernel_matches_scatters(rng, trial):
    pts, msk, poses = _scene(rng)
    rp = raster.transform_points(jnp.asarray(poses), jnp.asarray(pts))
    cells = raster.world_to_cell(rp, RES)
    want_cnt = np.asarray(raster.scatter_presence(cells, jnp.asarray(msk), HW))
    want_id = np.asarray(raster.scatter_max_id(cells, jnp.asarray(msk), HW))
    got_cnt, got_id = robot_maps_pallas(
        cells, jnp.asarray(msk), h=HW[0], w=HW[1], interpret=True)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    one = want_cnt == 1
    np.testing.assert_array_equal(np.asarray(got_id)[one], want_id[one])


def test_build_layers_pallas_same_packed_semantics(rng):
    """packed decodes (occupancy, count, id-at-1, categories) agree."""
    pts, msk, poses = _scene(rng, n=4)
    static = np.full(HW, 255, np.uint8)
    static[40:60, 40:44] = 0
    zero = (jnp.zeros((0, 3)), jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool))
    args = (jnp.asarray(static), RES, jnp.asarray(poses),
            jnp.asarray(pts), jnp.asarray(msk),
            zero[0], zero[1], zero[2], zero[1], zero[2], zero[1], zero[2])
    a = raster.build_layers(*args, robots_pallas=False)
    # interpret-mode pallas path via direct substitution
    rp = raster.transform_points(jnp.asarray(poses), jnp.asarray(pts))
    cells = raster.world_to_cell(rp, RES)
    cnt_k, id_k = robot_maps_pallas(cells, jnp.asarray(msk),
                                    h=HW[0], w=HW[1], interpret=True)
    pa = np.asarray(a.packed)
    cnt_a = (pa >> 1) & 3
    np.testing.assert_array_equal(np.asarray(jnp.minimum(cnt_k, 2)), cnt_a)
    one = np.asarray(cnt_k) == 1
    np.testing.assert_array_equal(np.asarray(id_k)[one],
                                  ((pa >> 3) & 0xFFF)[one])


def test_span_guard():
    big = circle_points(0, 0, 0.5)
    assert max_footprint_span(big[None], 0.015) > 30   # too big for kernel
    small = circle_points(0, 0, 0.17)
    assert max_footprint_span(small[None], 0.015) <= 30
