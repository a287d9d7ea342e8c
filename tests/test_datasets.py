"""ETH/UCY replay: loader semantics + env dataset scene replays verbatim."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from img_env_tpu.datasets.pedestrians import (
    PedDatasetConfig,
    build_world,
    build_world_arrays,
    load_trajectory_csv,
)


def make_csv(tmp_path):
    """Two peds walking straight lines, 2.5 fps data at fps=15 (6-frame gaps)."""
    rows = []
    for k in range(8):
        f = k * 6
        rows.append((f, 1, 0.1 * k, 1.0 + 0.5 * k))      # ped 1: (y, x)
    for k in range(6):
        f = 12 + k * 6
        rows.append((f, 2, 2.0, 3.0 - 0.3 * k))          # ped 2 appears later
    arr = np.asarray(rows, float)
    p = tmp_path / "world.csv"
    # reference layout: 4 rows (frame, ped, y, x)
    np.savetxt(p, arr.T, delimiter=",")
    return str(p)


def test_loader_shapes_and_alignment(tmp_path):
    path = make_csv(tmp_path)
    table = load_trajectory_csv(path)
    assert table.shape[1] == 4
    cfg = PedDatasetConfig(fps=15, control_hz=0.4, swapxy=True,
                           offset=(0.0, 0.0, 0.0))
    series = build_world(table, 0, 2, cfg)
    assert len(series) == 2
    t0, t1 = series[0], series[1]
    assert t0.shape == t1.shape  # padded to common length
    assert t0.shape[1] == 5
    # ped 1 with swapxy: world x = y_col, world y = x_col
    np.testing.assert_allclose(t0[0, 0], 0.0, atol=1e-9)
    np.testing.assert_allclose(t0[0, 1], 1.0, atol=1e-9)
    # ped 2 front-padded: first two subsampled entries hold its spawn pose
    np.testing.assert_allclose(t1[0, :2], t1[1, :2], atol=1e-9)
    # velocities are zero for the first two raw samples
    np.testing.assert_allclose(t0[0, 3:5], 0.0, atol=1e-12)


def test_build_world_arrays_padding(tmp_path):
    table = load_trajectory_csv(make_csv(tmp_path))
    cfg = PedDatasetConfig(fps=15, control_hz=0.4, offset=(0, 0, 0))
    traj, vel, length = build_world_arrays(table, 0, 2, cfg, pad_peds=4, pad_time=10)
    assert traj.shape == (4, 10, 2)
    assert vel.shape == (4, 10, 2)
    assert length.shape == (4,)
    assert length[2] == 1  # padded slots


def test_committed_eth_fixture_end_to_end():
    """The committed ETH-format fixture (tests/data/eth_world_fixture.csv,
    the transposed 4-row frame/ped/y/x layout of the reference's
    world_coordinate_inter_eth.csv, interpolated to 15 fps) drives the
    ``dataset`` scene through a real env episode.

    Reference: PedTrajectoryDatasetWrapper._read_dataset
    (evaluation_wrapper/PedTrajectoryDatasetWrapper.py:92-110)."""
    import os

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    path = os.path.join(os.path.dirname(__file__), "data",
                        "eth_world_fixture.csv")
    table = load_trajectory_csv(path)
    assert table.shape[1] == 4
    peds = np.unique(table[:, 1].astype(int))
    np.testing.assert_array_equal(peds, np.arange(1, 7))
    for pid in peds:  # interpolated layout: consecutive frame ids per ped
        f = table[table[:, 1].astype(int) == pid, 0].astype(int)
        np.testing.assert_array_equal(np.diff(f), 1)

    m = 6
    cfg = PedDatasetConfig(fps=15, control_hz=0.4, swapxy=True,
                           offset=(5.0, 5.0, 0.0), scale_x=0.7, scale_y=0.7)
    traj, vel, length = build_world_arrays(table, 0, m, cfg, pad_peds=m)

    # independent check of ped 1's subsampled path straight off the raw csv
    sel = table[:, 1].astype(int) == 1
    raw_y, raw_x = table[sel, 2], table[sel, 3]
    exp_x = raw_y * 0.7 + 5.0     # swapxy: world x <- y column
    exp_y = raw_x * 0.7 + 5.0
    # loader duplicates the first row (spawn delay) then subsamples every 6
    exp_x = np.insert(exp_x, 0, exp_x[0])[::6]
    exp_y = np.insert(exp_y, 0, exp_y[0])[::6]
    np.testing.assert_allclose(traj[0, :exp_x.size, 0], exp_x, atol=1e-5)
    np.testing.assert_allclose(traj[0, :exp_y.size, 1], exp_y, atol=1e-5)
    assert traj[..., 0].min() > 0.5 and traj[..., 0].max() < 9.5
    assert traj[..., 1].min() > 0.5 and traj[..., 1].max() < 9.5

    env_cfg = EnvConfig.from_dict({
        "robot": {
            "total": 1,
            "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
            "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
        },
        "ped_sim": {
            "total": m, "type": "dataset", "max_speed": [1.0],
            "shape": ["circle"], "size": [[0.0, 0.0, 0.17]],
            "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
            "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
        },
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
        "range_total": 32,
        "max_ped": m,
    })
    env = NavEnv(env_cfg, jit=False)
    state, obs = env.reset_fn(jax.random.PRNGKey(0),
                              dataset=(traj, vel, length))
    np.testing.assert_allclose(np.asarray(state.peds.pos), traj[:, 0],
                               atol=1e-5)
    actions = jnp.zeros((1, 3))
    for k in range(5):
        state, obs, *_ = env.step_fn(state, actions)
        np.testing.assert_allclose(np.asarray(state.peds.pos), traj[:, k],
                                   atol=1e-5)
    # a real observation surface is produced against the replayed crowd
    assert np.asarray(obs.ped_maps).max() > 0


def test_config_driven_dataset_replay():
    """The reference's yaml surface drives ETH/UCY replay directly:
    ``ped_traj_dataset`` + the wrapper's cfg keys (swapxy/offset/fps/
    scale_x/scale_y/ped_dataset_worlds/repeated_time_per_env) build the
    env and advance worlds across resets — no manual loader calls
    (PedTrajectoryDatasetWrapper.py:16-56)."""
    import os

    from img_env_tpu.env.gymapi import make_env
    from img_env_tpu.datasets.pedestrians import (
        PedDatasetConfig, build_world_arrays)

    path = os.path.join(os.path.dirname(__file__), "data",
                        "eth_world_fixture.csv")
    d = {
        "env_type": "robot_nav",
        "ped_traj_dataset": path,
        "swapxy": True,
        "offset": [5.0, 5.0, 0.0],
        "scale_x": 0.7, "scale_y": 0.7,
        "fps": 15,
        "ped_dataset_worlds": [[0, 2], [3, 5]],   # peds 1-3, then 4-6
        "repeated_time_per_env": 1,               # advance world each reset
        # fixed robot pose away from the ped paths AND clear of the walls
        # (room_10's free interior is [1.05, 9.9] m): the default wrapper
        # stack includes NeverStop, whose auto-reset on a spawn collision
        # would advance the dataset world mid-test
        "robot": {
            "total": 1,
            "begin_poses_type": ["fix"], "begin_poses": [[1.6, 1.6, 0.0]],
            "target_poses_type": ["fix"], "target_poses": [[9.2, 1.6]],
        },
        "ped_sim": {
            "total": 3, "type": "dataset", "max_speed": [1.0],
            "shape": ["circle"], "size": [[0.0, 0.0, 0.17]],
            "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
            "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
        },
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
        "range_total": 32,
        "max_ped": 3,
    }
    env = make_env(d, seed=0)

    # expected worlds straight from the loader
    table = load_trajectory_csv(path)
    dcfg = PedDatasetConfig(fps=15, control_hz=0.4, swapxy=True,
                            offset=(5.0, 5.0, 0.0), scale_x=0.7, scale_y=0.7)
    w0 = build_world_arrays(table, 0, 3, dcfg, pad_peds=3)
    w1 = build_world_arrays(table, 3, 3, dcfg, pad_peds=3)

    env.reset()
    np.testing.assert_allclose(np.asarray(env._state.peds.pos),
                               w0[0][:, 0], atol=1e-5)
    env.step(np.zeros((1, 2)))   # step 0 replays column 0 (img_env.cpp:361-386)
    env.step(np.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(env._state.peds.pos),
                               w0[0][:, 1], atol=1e-5)
    env.reset()   # second episode -> second world
    np.testing.assert_allclose(np.asarray(env._state.peds.pos),
                               w1[0][:, 0], atol=1e-5)
    env.reset()   # cycles back to world 0
    np.testing.assert_allclose(np.asarray(env._state.peds.pos),
                               w0[0][:, 0], atol=1e-5)


def test_dataset_world_span_raises_ped_total():
    """The reference sets ped_sim.total from the active world's ped span
    (PedTrajectoryDatasetWrapper.py:28); with static shapes we pad to the
    LARGEST world so no world's peds are silently truncated."""
    import os

    from img_env_tpu.config import EnvConfig

    path = os.path.join(os.path.dirname(__file__), "data",
                        "eth_world_fixture.csv")
    cfg = EnvConfig.from_dict({
        "ped_traj_dataset": path,
        "ped_dataset_worlds": [[0, 1], [2, 5]],   # spans 2 and 4
        "ped_sim": {"total": 3, "type": "dataset", "max_speed": [1.0],
                    "shape": ["circle"], "size": [[0.0, 0.0, 0.17]],
                    "begin_poses_type": ["range"],
                    "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                    "target_poses_type": ["range"],
                    "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
    })
    assert cfg.ped_sim.total == 4          # raised to the largest span
    # per-ped lists padded to match
    assert len(cfg.ped_sim.max_speed) == 4


def test_env_dataset_scene_replays_verbatim(tmp_path):
    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    m, t = 2, 12
    traj = np.zeros((m, t, 2), np.float32)
    vel = np.zeros((m, t, 2), np.float32)
    for i in range(m):
        traj[i, :, 0] = 2.0 + i + 0.3 * np.arange(t)
        traj[i, :, 1] = 3.0 + 0.5 * i
        vel[i, :, 0] = 0.3 / 0.4
    length = np.full((m,), t, np.int32)

    cfg = EnvConfig.from_dict({
        "robot": {
            "total": 1,
            "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
            "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
        },
        "ped_sim": {
            "total": m, "type": "dataset", "max_speed": [1.0],
            "shape": ["circle"], "size": [[0.0, 0.0, 0.17]],
            "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
            "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
        },
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
        "range_total": 32,
        "max_ped": m,
    })
    env = NavEnv(cfg, jit=False)
    state, obs = env.reset_fn(jax.random.PRNGKey(0), dataset=(traj, vel, length))
    np.testing.assert_allclose(np.asarray(state.peds.pos), traj[:, 0], atol=1e-6)
    actions = jnp.zeros((1, 3))
    for k in range(3):
        state, obs, *_ = env.step_fn(state, actions)
        np.testing.assert_allclose(
            np.asarray(state.peds.pos), traj[:, k], atol=1e-5)
    # clamps at the trajectory end
    for k in range(3, t + 4):
        state, obs, *_ = env.step_fn(state, actions)
    np.testing.assert_allclose(
        np.asarray(state.peds.pos), traj[:, t - 1], atol=1e-5)
