"""'fast' sensor mode: same pipeline on a coarse grid, bounded deviation."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_parallel import tiny_cfg


def test_fast_mode_close_to_parity():
    from img_env_tpu.env.nav_env import NavEnv

    cfg = tiny_cfg(robots=2, peds=1).replace(
        sensor_mode="parity", range_total=64)
    cfg_fast = cfg.replace(sensor_mode="fast", fast_sensor_scale=2)

    env_p = NavEnv(cfg, jit=False)
    env_f = NavEnv(cfg_fast, jit=False)
    key = jax.random.PRNGKey(3)
    sp, op_ = env_p.reset_fn(key)
    sf, of_ = env_f.reset_fn(key)

    # identical scenario (same key, sampler independent of sensor mode)
    np.testing.assert_array_equal(np.asarray(sp.robots.pose),
                                  np.asarray(sf.robots.pose))
    # collision codes are sensor-independent (footprint raster path)
    np.testing.assert_array_equal(np.asarray(op_.is_collisions),
                                  np.asarray(of_.is_collisions))

    # lasers: coarse-grid hits within a few coarse cells of the exact ones
    hp = np.asarray(op_.lasers) * cfg.laser_max      # undo normalization
    hf = np.asarray(of_.lasers) * cfg.laser_max
    tol = cfg_fast.fast_sensor_scale * cfg.view_map_resolution * 4 + 1e-6
    close = np.abs(hp - hf) <= tol
    assert close.mean() > 0.9, f"only {close.mean():.2%} of beams within {tol}"

    # sensor maps: gross structure agrees (free/occupied/unseen proportions)
    mp = np.asarray(op_.sensor_maps)
    mf = np.asarray(of_.sensor_maps)
    assert mp.shape == mf.shape
    assert abs(float(mp.mean()) - float(mf.mean())) < 0.08


def test_fast_mode_steps():
    from img_env_tpu.env.nav_env import NavEnv

    cfg = tiny_cfg(robots=2, peds=2).replace(
        sensor_mode="fast", fast_sensor_scale=2, range_total=32)
    env = NavEnv(cfg, jit=False)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    for _ in range(3):
        state, obs, reward, done, info = env.step_fn(
            state, jnp.tile(jnp.asarray([[0.3, 0.1, 0.0]]), (2, 1)))
    assert np.all(np.isfinite(np.asarray(obs.sensor_maps)))
    assert np.all(np.isfinite(np.asarray(obs.lasers)))
