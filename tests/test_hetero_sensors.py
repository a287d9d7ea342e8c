"""Per-robot sensor configs (heterogeneous teams) vs the C++ oracle.

The reference assigns ``sensor_cfgs[j]`` per robot (reset_helper.py:383-384)
feeding ``Agent::sensor_base_`` (img_env.cpp:131-132): FOV gating is about
the sensor (agent.cpp:381) and the ray walk starts at the sensor's view
cell (agent.cpp:367-369).  The engine groups robots by distinct sensor
config and runs one flat pipeline per group (nav_env.SensorGroup /
_sensor_pass_grouped); every surface must bit-match the native oracle
PER ROBOT with its own offset (VERDICT r3 #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.oracle import cpp_oracle

pytestmark = pytest.mark.skipif(
    not cpp_oracle.available(), reason="g++ toolchain unavailable")

SENSORS = [[0.15, 0.0], [-0.1, 0.08], [0.15, 0.0]]   # 2 groups, 3 robots
ROBOT_FIX = [[3.0, 3.0, 0.4], [5.5, 5.0, -1.2], [6.5, 3.5, 2.2]]
PED_FIX = [[4.5, 4.0, 0.0]]


def _cfg(use_laser=True):
    return EnvConfig.from_dict({
        "env_name": "hetero", "control_hz": 0.4, "use_laser": use_laser,
        "range_total": 64, "state_dim": 3, "max_ped": 1,
        "laser_norm": False, "laser_max": 10.0,
        "robot": {"total": 3, "shape": ["circle"] * 3,
                  "size": [[0, 0, 0.17]] * 3,
                  "sensor_cfgs": SENSORS,
                  "begin_poses_type": ["fix"] * 3,
                  "begin_poses": ROBOT_FIX,
                  "target_poses_type": ["fix"] * 3,
                  "target_poses": [[8.0, 8.0, 0], [1.5, 8.0, 0],
                                   [8.0, 1.5, 0]]},
        "object": {"total": 0},
        "ped_sim": {"total": 1, "type": "", "max_speed": [0.5],
                    "shape": ["circle"], "size": [[0, 0, 0.25]],
                    "begin_poses_type": ["fix"], "begin_poses": PED_FIX,
                    "target_poses_type": ["fix"], "target_poses": PED_FIX},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 3.0, "height": 3.0},
        "sensor_mode": "parity",
    })


def _oracle_world_maps(env, state):
    """Per-robot composed maps via the native draw (others only)."""
    st = env.statics
    base = np.asarray(state.obs_map).astype(np.uint8)
    m = np.asarray(state.peds.pos)
    for j in range(m.shape[0]):
        pose = np.asarray([m[j, 0], m[j, 1], float(state.peds.yaw[j])])
        pts = np.asarray(st.ped_body_points[j])[
            np.asarray(st.ped_body_mask[j])]
        cpp_oracle.draw(base, st.resolution, pose, pts, 1)
    maps = []
    poses = np.asarray(state.robots.pose)
    for i in range(poses.shape[0]):
        g = base.copy()
        for j in range(poses.shape[0]):
            if j != i:
                pts = np.asarray(st.robot_points[j])[
                    np.asarray(st.robot_mask[j])]
                cpp_oracle.draw(g, st.resolution, poses[j], pts, 2)
        maps.append(g)
    return maps


@pytest.mark.parametrize("use_laser", [True, False])
def test_hetero_env_bitmatches_oracle_per_robot(use_laser):
    cfg = _cfg(use_laser)
    env = NavEnv(cfg)
    assert env.hetero and len(env.statics.sensor_groups) == 2
    state, obs = env.reset(jax.random.PRNGKey(0))

    vp = env.statics.view_params
    poses = np.asarray(state.robots.pose)
    from img_env_tpu.ops.resize import sensor_map_from_view

    for i, wmap in enumerate(_oracle_world_maps(env, state)):
        want_view, want_hits, want_ang = cpp_oracle.view(
            wmap, env.statics.resolution, poses[i], vp.hpx, vp.wpx,
            vp.resolution, vp.half, vp.angle_begin, vp.angle_end,
            vp.min_dist, vp.max_dist, vp.range_total, use_laser,
            sensor=SENSORS[i])
        if use_laser:
            np.testing.assert_allclose(
                np.asarray(obs.lasers[i]), want_hits, atol=1e-9,
                err_msg=f"robot {i} hits (sensor {SENSORS[i]})")
            np.testing.assert_allclose(
                np.asarray(obs.angular_maps[i]), want_ang, atol=1e-9)
        # own footprint stamp (value 100, skipped over occupied cells)
        g = next(g for g in env.statics.sensor_groups
                 if i in g.idx.tolist())
        gi = g.idx.tolist().index(i)
        ref = want_view.astype(np.float32).reshape(vp.hpx, vp.wpx)
        cells = g.own_view_cells[gi][g.own_view_valid[gi]]
        vals = ref[cells[:, 0], cells[:, 1]]
        ref[cells[:, 0][vals != 0], cells[:, 1][vals != 0]] = 100.0
        want_sm = np.asarray(sensor_map_from_view(
            jnp.asarray(ref)[None], tuple(cfg.image_size)))[0]
        # compare in the uint8 pixel domain: the two paths divide by 255
        # in different float widths (one-ULP f32 wiggle), but the resized
        # pixel VALUES must agree exactly
        np.testing.assert_array_equal(
            np.round(np.asarray(obs.sensor_maps[i], np.float64) * 255),
            np.round(want_sm.astype(np.float64) * 255),
            err_msg=f"robot {i} sensor_map (sensor {SENSORS[i]})")


def test_hetero_multiscene_flat_matches_legacy():
    """The grouped flat path under scene batching == vmapped single-scene."""
    from img_env_tpu.parallel.batched_env import BatchedNavEnv

    cfg = _cfg(True)
    s = 3
    keys = jax.random.split(jax.random.PRNGKey(5), s)
    actions = jnp.tile(
        jnp.asarray([[0.4, 0.2, 0.0], [0.3, -0.3, 0.0], [0.5, 0.1, 0.0]]),
        (s, 1, 1))

    def run(legacy):
        env = BatchedNavEnv(cfg, mesh=None, legacy_vmap=legacy)
        states, obs = env.reset(keys)
        seq = [obs]
        for _ in range(2):
            states, obs, *_ = env.step(states, actions)
            seq.append(obs)
        return seq

    flat, legacy = run(False), run(True)
    for t, (got, want) in enumerate(zip(flat, legacy)):
        for field in ("sensor_maps", "lasers", "angular_maps",
                      "is_collisions", "vector_states"):
            g, w = np.asarray(getattr(got, field)), np.asarray(
                getattr(want, field))
            assert np.array_equal(g, w), (t, field)
