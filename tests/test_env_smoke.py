"""End-to-end environment smoke tests on small configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig


def _small_cfg(ped_type="rvoscene", n_ped=2, n_rob=2, n_obs=2):
    return EnvConfig.from_dict(
        {
            "robot": {
                "total": n_rob,
                "shape": ["circle"],
                "size": [[0.0, 0.0, 0.17]],
                "begin_poses_type": ["range"],
                "begin_poses": [[2.0, 9.0, 2.0, 9.0]],
                "target_poses_type": ["range"],
                "target_poses": [[2.0, 9.0, 2.0, 9.0]],
            },
            "object": {
                "total": n_obs,
                "shape": ["circle", "rectangle"],
                "size_range": [[0.2, 0.3], [-0.15, 0.15, -0.15, 0.15]],
                "poses_type": ["range"],
                "poses": [[2.5, 8.5, 2.5, 8.5]],
            },
            "ped_sim": {
                "total": n_ped,
                "type": ped_type,
                "max_speed": [0.5],
                "shape": ["leg", "circle"],
                "size": [[0, 0.1, 0.1], [0, 0, 0.17]],
                "begin_poses_type": ["range"],
                "begin_poses": [[2.0, 9.0, 2.0, 9.0]],
                "target_poses_type": ["range"],
                "target_poses": [[2.0, 9.0, 2.0, 9.0]],
                "go_back": "yes",
            },
            "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
            "view_map": {"resolution": 0.05, "width": 3, "height": 3},
            "image_size": [48, 48],
            "ped_image_size": [48, 48],
            "range_total": 96,
            "control_hz": 0.4,
            "max_ped": 4,
        }
    )


@pytest.mark.parametrize("ped_type", ["rvoscene", "ervoscene", "pedscene"])
def test_env_reset_step(ped_type):
    from img_env_tpu.env.nav_env import NavEnv

    cfg = _small_cfg(ped_type)
    env = NavEnv(cfg, jit=True)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)

    n = cfg.robot.total
    assert obs.sensor_maps.shape == (n, 48, 48)
    assert obs.lasers.shape == (n, 96)
    assert obs.ped_maps.shape == (n, 3, 48, 48)
    assert obs.vector_states.shape == (n, 3)
    assert obs.ped_vector_states.shape == (n, 1 + 7 * 4)
    np.testing.assert_array_equal(np.asarray(obs.step_ds), 0.0)

    acts = jnp.tile(jnp.asarray([[0.4, 0.2, 0.0]]), (n, 1))
    for i in range(5):
        state, obs, reward, done, info = env.step(state, acts)
        assert obs.sensor_maps.shape == (n, 48, 48)
        assert np.isfinite(np.asarray(obs.vector_states)).all()
        assert np.isfinite(np.asarray(obs.lasers)).all()
        assert np.asarray(obs.is_collisions).max() <= 3

    # peds should have moved under the crowd model
    if cfg.ped_sim.total:
        moved = np.linalg.norm(
            np.asarray(state.peds.pos) - np.asarray(state.peds.prev_pos), axis=-1
        )
        assert np.isfinite(moved).all()


def test_env_no_peds():
    from img_env_tpu.env.nav_env import NavEnv

    cfg = _small_cfg(n_ped=0)
    env = NavEnv(cfg, jit=True)
    state, obs = env.reset(jax.random.PRNGKey(1))
    n = cfg.robot.total
    state, obs, reward, done, info = env.step(
        state, jnp.tile(jnp.asarray([[0.5, 0.0, 0.0]]), (n, 1))
    )
    assert obs.sensor_maps.shape == (n, 48, 48)
    assert np.asarray(obs.ped_min_dists).min() == np.inf


def test_env_arrival_latches():
    from img_env_tpu.env.nav_env import NavEnv

    cfg = _small_cfg(n_ped=0, n_obs=0, n_rob=1)
    env = NavEnv(cfg, jit=True)
    state, obs = env.reset(jax.random.PRNGKey(2))
    # drive straight toward the goal using the base-frame goal bearing
    for i in range(60):
        vec = np.asarray(obs.vector_states)[0]
        ang = np.arctan2(vec[1], vec[0])
        acts = jnp.asarray([[0.6, np.clip(2.0 * ang, -0.9, 0.9), 0.0]])
        state, obs, reward, done, info = env.step(state, acts)
        if np.asarray(done)[0] > 0:
            break
    assert np.asarray(obs.is_arrives)[0] == 1 or np.asarray(obs.is_collisions)[0] > 0


def test_ervo_beep_evacuation_end_to_end():
    """act_dim 3 beep (v_y > 0, ped_ca_p 1.0) drives ERVO pedestrians away
    from the robot (ERVOSimulator::doStep evacuation term, full env path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    cfg = EnvConfig.from_dict({
        "env_name": "beep", "control_hz": 0.4, "act_dim": 3,
        "ped_ca_p": 1.0, "beep_r": 2.0,
        "robot": {"total": 1, "shape": ["circle"], "size": [[0, 0, 0.17]],
                  "begin_poses_type": ["fix"], "begin_poses": [[5.0, 5.0, 0.0]],
                  "target_poses_type": ["fix"], "target_poses": [[9.0, 5.0, 0.0]]},
        "object": {"total": 0},
        "ped_sim": {"total": 4, "type": "ervoscene", "max_speed": [0.5],
                    "shape": ["circle"], "size": [[0, 0, 0.17]],
                    "begin_poses_type": ["fix"] * 4,
                    "begin_poses": [[6.0, 5.0, 0], [6.0, 4.5, 0],
                                    [6.0, 5.5, 0], [6.5, 5.0, 0]],
                    "target_poses_type": ["fix"] * 4,
                    "target_poses": [[6.0, 5.0, 0], [6.0, 4.5, 0],
                                     [6.0, 5.5, 0], [6.5, 5.0, 0]],
                    "go_back": "no"},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
        "range_total": 64, "max_ped": 5, "state_dim": 3,
        "sensor_mode": "fast",
    })
    env = NavEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    p0 = np.asarray(state.peds.pos).copy()
    for _ in range(8):
        state, obs, r, d, i = env.step(state, jnp.asarray([[0.0, 0.0, 1.0]]))
    d_before = np.linalg.norm(p0 - np.asarray([5.0, 5.0]), axis=-1)
    d_after = np.linalg.norm(
        np.asarray(state.peds.pos) - np.asarray([5.0, 5.0]), axis=-1)
    assert (d_after > d_before + 0.1).all()


def test_statics_cache_roundtrip(tmp_path, monkeypatch):
    """IMG_ENV_TPU_STATICS_CACHE warm start returns bit-identical statics
    (same config + map + package source -> same key -> same tables)."""
    import numpy as np

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    monkeypatch.setenv("IMG_ENV_TPU_STATICS_CACHE", str(tmp_path))
    cfg = EnvConfig.from_dict({
        "robot": {"total": 2,
                  "begin_poses_type": ["range"],
                  "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                  "target_poses_type": ["range"],
                  "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "ped_sim": {"total": 0},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 3.0, "height": 3.0},
        "range_total": 32,
    })
    cold = NavEnv(cfg, jit=False)
    assert any(f.startswith("statics-st-") for f in tmp_path.iterdir()
               for f in [f.name]), "cache entry not written"
    warm = NavEnv(cfg, jit=False)
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(cold.statics),
                    jax.tree_util.tree_leaves(warm.statics)):
        if hasattr(x, "shape"):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            assert x == y
