"""lidar_process + sarl_helper ports: parity with reference formulas."""

import math

import jax.numpy as jnp
import numpy as np

from img_env_tpu.utils.lidar import (
    down_sample,
    lidar_log_map,
    lidar_to_map,
    normal_sample,
    trans_lidar_log_map,
)
from img_env_tpu.utils.sarl import batched_sarl_states, concat_sarl_states


def ref_down_sample(lidar, sample_num):
    out = []
    n = len(lidar) // sample_num
    for i in range(n):
        out.append(min(6.0, min(lidar[i * sample_num:(i + 1) * sample_num])))
    return out


def ref_lidar_to_map(lidar, length):
    ld_map = []
    gap = 6.0 / length
    for ld in lidar:
        temp, left, right = [], 0, gap
        for i in range(length):
            if right <= ld:
                temp.append(1.0)
            elif left <= ld < right:
                temp.append(0.0)
            else:
                temp.append(0.5)
            left = right
            right += gap
        ld_map.append(temp)
    return np.asarray(ld_map)


def ref_lidar_log_map(lidar, length):
    max_dis = max(6.0, max(lidar))
    ld_map = []
    gap = math.log(max_dis + 1) / length
    for ld in lidar:
        temp, left, right = [], 0.0, gap
        for i in range(length):
            e_left = math.e ** left - 1
            e_right = min(math.e ** right - 1, 6)
            if e_right <= ld:
                temp.append(0.0)
            elif e_left <= ld < e_right:
                temp.append(1.0)
            else:
                temp.append(0.5)
            left = right
            right += gap
        ld_map.append(temp)
    return np.asarray(ld_map)


def test_down_sample_parity(rng):
    lidar = rng.uniform(0.2, 8.0, size=100)
    got = np.asarray(down_sample(jnp.asarray(lidar), 20))
    np.testing.assert_allclose(got, ref_down_sample(list(lidar), 20), atol=1e-6)


def test_normal_sample():
    lidar = jnp.arange(10.0)
    np.testing.assert_allclose(
        np.asarray(normal_sample(lidar, 3)), [0.0, 3.0, 6.0])


def test_lidar_to_map_parity(rng):
    lidar = rng.uniform(0.0, 6.5, size=7)
    got = np.asarray(lidar_to_map(jnp.asarray(lidar), 16))
    np.testing.assert_allclose(got, ref_lidar_to_map(lidar, 16), atol=1e-6)


def test_lidar_log_map_parity(rng):
    lidar = rng.uniform(0.0, 6.0, size=5)
    got = np.asarray(lidar_log_map(jnp.asarray(lidar), 48))
    np.testing.assert_allclose(got, ref_lidar_log_map(lidar, 48), atol=1e-5)


def test_trans_pipeline_shape(rng):
    lasers = jnp.asarray(rng.uniform(0.1, 6.0, size=960))
    img = trans_lidar_log_map(lasers, 20, 48)
    assert img.shape == (48, 48)


def test_sarl_rows():
    vec = jnp.asarray([2.0, 1.0, 0.3, 0.4, 0.1])
    ped = jnp.zeros((1 + 7 * 4,))
    ped = ped.at[0].set(2.0)
    ped = ped.at[1:8].set(jnp.asarray([1.0, 0.5, 0.1, 0.2, 0.3, 0.47, 1.12]))
    rows, valid = concat_sarl_states(vec, ped, 0.17, 7, 4)
    assert rows.shape == (4, 14)
    np.testing.assert_allclose(np.asarray(rows[0, :2]), [2.0, 1.0])
    np.testing.assert_allclose(float(rows[0, 4]), math.sqrt(5.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rows[0, 7:]),
                               [1.0, 0.5, 0.1, 0.2, 0.3, 0.47, 1.12], atol=1e-6)
    assert np.asarray(valid).tolist() == [True, True, False, False]


def test_sarl_dummy_ped():
    vec = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0])
    ped = jnp.zeros((1 + 7 * 3,))
    rows, valid = concat_sarl_states(vec, ped, 0.17, 7, 3)
    np.testing.assert_allclose(
        np.asarray(rows[0, 7:]), [10, 10, 0.5, 0.5, 0.2, 0.37, 14], atol=1e-6)
    assert np.asarray(valid).tolist() == [True, False, False]
