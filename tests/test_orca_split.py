"""RVO2 obstacle kd-tree segment splitting (crowd/obstacle_split.py).

The reference's obstacle tree build (ervo_ros/src/KdTree.cpp:131-257) splits
segments straddling partition lines, inserting collinear convex
pseudo-vertices that change ORCA constraints near adjacent rectangles.
These tests check the fixed-shape JAX worklist against the sequential
oracle build, and the full solve on layouts where unsplit segments
measurably diverge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.crowd.obstacle_split import split_segments
from img_env_tpu.crowd.orca import OrcaConfig, orca_step
from img_env_tpu.oracle import orca_oracle as O


def _canon_oracle(segs):
    return sorted(
        (round(s.p1[0], 9), round(s.p1[1], 9), round(s.p2[0], 9),
         round(s.p2[1], 9), bool(s.convex1), bool(s.convex2))
        for s in segs)


def _canon_jax(sj):
    p1, p2 = np.asarray(sj.p1), np.asarray(sj.p2)
    c1, c2 = np.asarray(sj.convex1), np.asarray(sj.convex2)
    v = np.asarray(sj.valid)
    return sorted(
        (round(p1[i, 0], 9), round(p1[i, 1], 9), round(p2[i, 0], 9),
         round(p2[i, 1], 9), bool(c1[i]), bool(c2[i]))
        for i in range(len(v)) if v[i])


def _random_layout(rng, n_rects, adjacency=True):
    aa = []
    for _ in range(n_rects):
        x, y = rng.uniform(1, 8, 2)
        w, h = rng.uniform(0.3, 2.5, 2)
        aa.append([x, y, x + w, y + h])
    if adjacency and n_rects > 1:
        x, y, xb, yb = aa[0]
        aa.append([xb, y, xb + 1.0, yb])   # shares an edge -> collinear split
    return np.array(aa)


@pytest.mark.parametrize("trial", range(8))
def test_split_build_matches_oracle(rng, trial):
    aabbs = _random_layout(rng, int(rng.integers(1, 7)))
    ref = _canon_oracle(O.split_segments_from_rects(aabbs))
    got, ovf = jax.jit(split_segments)(
        jnp.asarray(aabbs), jnp.ones(len(aabbs), bool))
    assert not bool(ovf)
    assert _canon_jax(got) == ref


def test_split_preserves_boundary_length():
    aabbs = np.array([
        [2.0, 2.0, 3.0, 3.0], [3.0, 2.0, 4.0, 3.0],
        [2.0, 5.0, 6.0, 5.5], [5.0, 1.0, 5.5, 6.0]])
    segs, ovf = split_segments(jnp.asarray(aabbs), jnp.ones(4, bool))
    v = np.asarray(segs.valid)
    lens = np.linalg.norm(np.asarray(segs.p2) - np.asarray(segs.p1), axis=-1)
    assert not bool(ovf)
    assert int(v.sum()) > 16                   # splits actually happened
    np.testing.assert_allclose(lens[v].sum(), 28.0, atol=1e-9)
    # split pseudo-vertices are convex (KdTree.cpp:233)
    assert np.asarray(segs.convex1)[v][16:].all() if v.sum() > 16 else True


def test_invalid_obstacles_excluded():
    aabbs = np.array([[2.0, 2.0, 3.0, 3.0], [3.0, 2.0, 4.0, 3.0]])
    segs, _ = split_segments(jnp.asarray(aabbs),
                             jnp.asarray([True, False]))
    v = np.asarray(segs.valid)
    assert int(v.sum()) == 4                   # only rect 0, nothing to split
    np.testing.assert_allclose(
        np.asarray(segs.p1)[v].min(axis=0), [2.0, 2.0])


def test_split_build_vmaps():
    aabbs = jnp.asarray([
        [[2.0, 2.0, 3.0, 3.0], [3.0, 2.0, 4.0, 3.0]],
        [[1.0, 1.0, 2.0, 4.0], [2.0, 2.0, 5.0, 3.0]],
    ])
    valid = jnp.ones((2, 2), bool)
    segs, ovf = jax.vmap(split_segments)(aabbs, valid)
    for s in range(2):
        one = jax.tree_util.tree_map(lambda x: x[s], segs)
        ref = _canon_oracle(O.split_segments_from_rects(np.asarray(aabbs[s])))
        assert _canon_jax(one) == ref


def test_solve_on_adversarial_layout_matches_oracle(rng):
    """Layout where unsplit segments diverge ~0.5 m/s from the reference:
    the split path must match the faithful oracle."""
    aabbs = np.array([
        [2.0, 5.0, 6.0, 5.5],     # long bar
        [1.0, 5.3, 2.5, 6.3],     # overlapping rect
        [2.5, 4.0, 3.5, 5.36],    # adjacent below
    ])
    m = 6
    pos = rng.uniform(1.0, 6.5, (m, 2))
    vel = rng.uniform(-0.5, 0.5, (m, 2))
    pref = rng.uniform(-0.6, 0.6, (m, 2))
    rad = np.full(m, 0.5)
    ms = np.full(m, 0.6)
    seg, ovf = split_segments(jnp.asarray(aabbs), jnp.ones(3, bool))
    assert not bool(ovf)
    got_pos, got_vel = orca_step(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(pref),
        jnp.asarray(rad), jnp.asarray(ms), jnp.ones(m, bool),
        jnp.zeros((0, 2)), jnp.zeros((0, 2)), jnp.zeros((0,), bool),
        OrcaConfig(time_step=0.4, max_obs_segments=32), seg)
    want_pos, want_vel = O.orca_oracle_step(
        pos, vel, pref, rad, ms, np.zeros((0, 2)), np.zeros((0, 2)),
        aabbs, time_step=0.4, split=True)
    np.testing.assert_allclose(np.asarray(got_vel), want_vel, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_pos), want_pos, atol=1e-8)


def test_env_reset_builds_split_segments():
    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    cfg = EnvConfig.from_dict({
        "robot": {"total": 1, "begin_poses_type": ["range"],
                  "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                  "target_poses_type": ["range"],
                  "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "object": {"total": 4, "shape": ["rectangle"],
                   "size_range": [[0.1, 0.4, 0.1, 0.4]],
                   "poses_type": ["range"],
                   "poses": [[2.0, 8.0, 2.0, 8.0]]},
        "ped_sim": {"total": 3, "type": "rvoscene",
                    "max_speed": [0.5], "shape": ["circle"],
                    "size": [[0.0, 0.0, 0.2]],
                    "begin_poses_type": ["range"],
                    "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                    "target_poses_type": ["range"],
                    "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "range_total": 32,
    })
    env = NavEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert state.obstacles.segs is not None
    v = np.asarray(state.obstacles.segs.valid)
    assert int(v.sum()) >= 16                  # 4 rects, possibly split
    # and the env steps with the split segments in the crowd solve
    state2, *_ = env.step_fn(
        state, jnp.zeros((1, 3)), env.sensor_tables)
    assert np.isfinite(np.asarray(state2.peds.pos)).all()
