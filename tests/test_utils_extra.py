"""Transforms, action containers, BARN suite smoke."""

import math

import numpy as np
import pytest

from img_env_tpu.env.action import ContinuousAction, DiscreteActions
from img_env_tpu.utils.transforms import (
    inverse,
    matrix_from_t_q,
    mul_matrix,
    quaternion_from_yaw,
    rpy_from_matrix,
    t_from_matrix,
    transform_point,
    yaw_from_quaternion,
)


def test_quaternion_yaw_roundtrip():
    for yaw in [-2.5, -0.3, 0.0, 1.1, 3.0]:
        q = quaternion_from_yaw(yaw)
        np.testing.assert_allclose(yaw_from_quaternion(q), yaw, atol=1e-12)


def test_matrix_roundtrip_and_inverse():
    t = [1.0, 2.0, 0.5]
    q = quaternion_from_yaw(0.7)
    m = matrix_from_t_q(t, q)
    np.testing.assert_allclose(t_from_matrix(m), t, atol=1e-12)
    np.testing.assert_allclose(rpy_from_matrix(m)[2], 0.7, atol=1e-12)
    ident = mul_matrix(m, inverse(m))
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-12)


def test_transform_point():
    m = matrix_from_t_q([1, 0, 0], quaternion_from_yaw(math.pi / 2))
    p = transform_point(m, [1.0, 0.0])
    np.testing.assert_allclose(p[:2], [1.0, 1.0], atol=1e-12)


def test_discrete_actions():
    da = DiscreteActions([[0.0, -0.9], [0.2, 0.0, 1.0]])
    assert len(da) == 2
    assert da[1].beep == 1.0
    with pytest.raises(AssertionError):
        DiscreteActions([[-0.1, 0.0]])


def test_barn_suite_one_world(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from img_env_tpu.eval.barn import run_barn_suite
    from tests.test_parallel import tiny_cfg

    cfg = tiny_cfg(robots=1).replace(time_max=15)
    world = cfg.resolve_map_path()

    def policy(key, obs):
        return np.asarray([[0.4, 0.0]])

    csv_path = str(tmp_path / "barn.csv")
    rows = run_barn_suite([world], cfg, policy, episodes_per_world=1,
                          max_steps=20, output_csv=csv_path)
    assert len(rows) == 1
    assert rows[0]["world"] == "room_10.png"
    assert (tmp_path / "barn.csv").exists()


def test_orbax_checkpoint_roundtrip(tmp_path):
    """TrainState-shaped pytrees survive an orbax save/restore."""
    import jax.numpy as jnp
    import numpy as np

    from img_env_tpu.train import checkpoint as ckpt

    tree = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))},
        "step": jnp.asarray(7, jnp.int32),
    }
    path = str(tmp_path / "ck")
    ckpt.save(path, tree)
    back = ckpt.restore(path, like=tree)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert int(back["step"]) == 7
