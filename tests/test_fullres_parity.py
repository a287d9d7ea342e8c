"""Full-resolution (400x400 view, 960 beams, 24 chunks) parity fixture.

The production bench shape exercises different PolarStatics.build branches
(512-slot fill windows, 24 radial chunks) than the small unit tests.  This
fixture runs the complete matmul sensor pipeline — fill, raycast,
exact painter decode — at that shape for robots in the interior AND near
the world-map edge (view window sticking out of the grid), and demands
bit-for-bit equality with the native C++ oracle (cpp/oracle.cpp, a
transliteration of agent.cpp:356-624).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.ops import polar, raster
from img_env_tpu.ops.footprint import circle_points, rectangle_points
from img_env_tpu.ops.painter import PainterStatics, hit_steps, paint_sorted
from img_env_tpu.ops.view import ViewParams
from img_env_tpu.oracle import cpp_oracle

pytestmark = pytest.mark.skipif(
    not cpp_oracle.available(), reason="g++ toolchain unavailable")

RES = 0.015
VP = ViewParams(
    hpx=400, wpx=400, resolution=RES, half=3.0,
    angle_begin=-1.570795, angle_end=1.570795,
    min_dist=0.0, max_dist=10.0, range_total=960, use_laser=True,
)


def _scene(rng):
    """9 m world (600 px at 0.015) with walls, blocks, 2 obstacles, 1 ped."""
    hw = 600
    static = np.full((hw, hw), 255, np.uint8)
    static[:6, :] = 0
    static[-6:, :] = 0
    static[:, :6] = 0
    static[:, -6:] = 0
    for _ in range(8):
        x, y = rng.integers(40, hw - 60, 2)
        static[x: x + rng.integers(8, 40), y: y + rng.integers(8, 40)] = 0

    obs = [(np.array([rng.uniform(2, 7), rng.uniform(2, 7),
                      rng.uniform(-3, 3)]),
            circle_points(0, 0, rng.uniform(0.15, 0.35))) for _ in range(2)]
    obs.append((np.array([4.5, 3.0, 0.4]), rectangle_points(-0.3, 0.3, -0.2, 0.2)))
    peds = [(np.array([rng.uniform(2, 7), rng.uniform(2, 7),
                       rng.uniform(-3, 3)]),
             circle_points(0, 0, 0.25))]
    # robot 0 interior; robot 1 near the corner so its 6 m view window
    # sticks out of the world map (exercises the is_in_map / OOB branches)
    robots = [
        (np.array([4.6, 4.2, rng.uniform(-3, 3)]), circle_points(0, 0, 0.17)),
        (np.array([1.0, 1.2, rng.uniform(-3, 3)]), circle_points(0, 0, 0.17)),
    ]
    return static, obs, peds, robots


def _pad(clouds):
    pmax = max(c.shape[0] for c in clouds)
    pts = np.zeros((len(clouds), pmax, 2), np.float32)
    msk = np.zeros((len(clouds), pmax), bool)
    for i, c in enumerate(clouds):
        pts[i, : c.shape[0]] = c
        msk[i, : c.shape[0]] = True
    return pts, msk


def _layers(static, obs, peds, robots):
    obs_map = raster.draw_obstacles(
        jnp.asarray(static), RES,
        jnp.asarray(np.stack([p for p, _ in obs])),
        *map(jnp.asarray, _pad([c for _, c in obs])))
    rob_poses = np.stack([p for p, _ in robots])
    rob_pts, rob_msk = _pad([c for _, c in robots])
    ped_pose3 = np.stack([p for p, _ in peds])
    ped_pts, ped_msk = _pad([c for _, c in peds])
    return raster.build_layers(
        obs_map, RES,
        jnp.asarray(rob_poses), jnp.asarray(rob_pts), jnp.asarray(rob_msk),
        jnp.asarray(ped_pose3), jnp.asarray(ped_pts), jnp.asarray(ped_msk),
        jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), bool),
        jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), bool),
    )


def _oracle_world_maps(static, obs, peds, robots):
    """Composed per-robot world maps via the fast native draw."""
    base = static.copy()
    for pose, bbox in obs:
        cpp_oracle.draw(base, RES, pose, bbox, 0)
    for pose, bbox in peds:
        cpp_oracle.draw(base, RES, pose, bbox, 1)
    maps = []
    for i in range(len(robots)):
        g = base.copy()
        for j, (pose, bbox) in enumerate(robots):
            if j != i:
                cpp_oracle.draw(g, RES, pose, bbox, 2)
        maps.append(g)
    return maps


@pytest.fixture(scope="module")
def fullres_statics():
    ps = polar.PolarStatics.build(VP, image_size=(48, 48))
    pst = PainterStatics.build(ps)
    return ps, pst


def test_fullres_laser_parity(rng, fullres_statics):
    ps, pst = fullres_statics
    assert ps.fill_window == 512 and len(ps.b_chunks) == 24  # prod branches

    static, obs, peds, robots = _scene(rng)
    rob_poses = np.stack([p for p, _ in robots])
    layers = _layers(static, obs, peds, robots)

    occ = polar.fill_sorted(ps, layers.packed, RES, jnp.asarray(rob_poses))
    hits, ang, aux = polar.raycast_batched(ps, occ, return_aux=True)
    s_hit, s_tail = hit_steps(pst, *aux)
    vals = np.asarray(paint_sorted(pst, s_hit, s_tail))
    hits, ang = np.asarray(hits), np.asarray(ang)

    live = ps.perm >= 0
    for i, wmap in enumerate(_oracle_world_maps(static, obs, peds, robots)):
        want_view, want_hits, want_ang = cpp_oracle.view(
            wmap, RES, rob_poses[i], VP.hpx, VP.wpx, RES, VP.half,
            VP.angle_begin, VP.angle_end, VP.min_dist, VP.max_dist,
            VP.range_total, True)
        np.testing.assert_allclose(hits[i], want_hits, atol=1e-9,
                                   err_msg=f"robot {i} hits")
        np.testing.assert_allclose(ang[i], want_ang, atol=1e-9)
        ref_flat = want_view.reshape(-1).astype(np.float32)
        np.testing.assert_array_equal(
            vals[i][live], ref_flat[ps.perm[live]],
            err_msg=f"robot {i} view map")


def test_fullres_no_laser_parity(rng, fullres_statics):
    ps, _ = fullres_statics
    static, obs, peds, robots = _scene(rng)
    rob_poses = np.stack([p for p, _ in robots])
    layers = _layers(static, obs, peds, robots)
    occ = polar.fill_sorted(ps, layers.packed, RES, jnp.asarray(rob_poses))
    inside = polar.inside_sorted(ps, layers.packed.shape, RES,
                                 jnp.asarray(rob_poses))
    vals = np.asarray(polar.plain_values_sorted(ps, occ, inside))

    live = ps.perm >= 0
    for i, wmap in enumerate(_oracle_world_maps(static, obs, peds, robots)):
        want_view, _, _ = cpp_oracle.view(
            wmap, RES, rob_poses[i], VP.hpx, VP.wpx, RES, VP.half,
            VP.angle_begin, VP.angle_end, VP.min_dist, VP.max_dist,
            VP.range_total, False)
        ref_flat = want_view.reshape(-1).astype(np.float32)
        np.testing.assert_array_equal(
            vals[i][live], ref_flat[ps.perm[live]],
            err_msg=f"robot {i} plain view")
