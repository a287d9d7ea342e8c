"""Pedestrian prediction heads + MPC integration with each head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.crowd.orca import OrcaConfig
from img_env_tpu.mpc.prediction import predict_cv, predict_orca, predict_peds, predict_sfm


def test_cv_prediction():
    pos = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    vel = jnp.asarray([[0.5, 0.0], [0.0, -0.25]])
    traj = predict_cv(pos, vel, 4, 0.4)
    assert traj.shape == (4, 2, 2)
    np.testing.assert_allclose(np.asarray(traj[0, 0]), [1.2, 2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj[3, 1]), [0.0, -0.4], atol=1e-6)


def test_orca_prediction_separates():
    """Two peds on a collision course deviate under the ORCA head but not CV."""
    # slight lateral offset breaks the head-on symmetry (exact symmetry is
    # a known ORCA degenerate case — both agents pick mirrored half-planes)
    pos = jnp.asarray([[0.0, 0.02], [2.0, -0.02]])
    vel = jnp.asarray([[0.5, 0.0], [-0.5, 0.0]])
    vmax = jnp.asarray([0.5, 0.5])
    cfg = OrcaConfig(time_step=0.4, max_obs_segments=4)
    traj_cv = predict_cv(pos, vel, 8, 0.4)
    traj_orca = predict_orca(pos, vel, vmax, 8, 0.4, cfg)
    d_cv = np.linalg.norm(np.asarray(traj_cv[:, 0] - traj_cv[:, 1]), axis=-1).min()
    d_orca = np.linalg.norm(np.asarray(traj_orca[:, 0] - traj_orca[:, 1]), axis=-1).min()
    assert d_orca > d_cv + 0.3  # avoidance increases min separation


def test_sfm_prediction_moves():
    pos = jnp.asarray([[1.0, 1.0]])
    vel = jnp.asarray([[0.4, 0.0]])
    traj = predict_sfm(pos, vel, jnp.asarray([0.5]), 6, 0.4)
    assert traj.shape == (6, 1, 2)
    assert float(traj[-1, 0, 0]) > 1.2  # keeps walking forward


def test_predict_dispatch_empty():
    out = predict_peds("orca", jnp.zeros((0, 2)), jnp.zeros((0, 2)),
                       jnp.zeros((0,)), 5, 0.4)
    assert out.shape == (5, 0, 2)


@pytest.mark.parametrize("head", ["cv", "orca", "sfm"])
def test_controller_with_heads(head):
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.mpc.controller import MpcController
    from img_env_tpu.mpc.mppi import MppiConfig
    from tests.test_parallel import tiny_cfg

    cfg = tiny_cfg(robots=1, peds=2)
    env = NavEnv(cfg, jit=False)
    ctl = MpcController(env, MppiConfig(horizon=6, samples=32),
                        ped_prediction=head)
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    actions, ms, costs = ctl.act_fn(
        jax.random.PRNGKey(1), state, ctl.init_state())
    assert actions.shape == (1, 3)
    assert np.isfinite(np.asarray(costs)).all()
