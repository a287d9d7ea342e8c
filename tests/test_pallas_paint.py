"""Pallas painter kernel vs the XLA dense decode (interpret mode on CPU).

The TPU kernel (ops/pallas_paint.py) must reproduce paint_sorted — the
exact per-ray painter trace of agent.cpp:511-624 — bit for bit: same
integer tables, same last-writer max.  bench.py --selfcheck re-asserts
this at the production 400x400/960 shape on the real chip; this test
covers the kernel logic (half-block pairing, wide-slot overlay, robot
padding) on CPU where the suite runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.ops import polar
from img_env_tpu.ops.painter import (
    PainterStatics,
    hit_steps,
    paint_sorted,
)
from img_env_tpu.ops.pallas_paint import (
    PaintKernelStatics,
    paint_sorted_pallas,
)
from img_env_tpu.ops.view import ViewParams

from tests.test_raster import RES, _layers_from_scene, _random_scene

VP = ViewParams(
    hpx=64, wpx=64, resolution=RES, half=1.6,
    angle_begin=-1.570795, angle_end=1.570795,
    min_dist=0.0, max_dist=10.0, range_total=32, use_laser=True,
)


@pytest.fixture(scope="module")
def statics():
    ps = polar.PolarStatics.build(VP, n_chunks=8)
    pst = PainterStatics.build(ps)
    ks = PaintKernelStatics.build(pst)
    return ps, pst, ks


@pytest.mark.parametrize("trial", range(3))
def test_paint_kernel_bitmatch(rng, statics, trial):
    ps, pst, ks = statics
    static, obs, peds, robots = _random_scene(rng, n_rob=5, n_ped=2, n_obs=3)
    layers = _layers_from_scene(static, obs, peds, robots)
    poses = jnp.asarray(np.stack([p for p, _ in robots]), jnp.float32)

    occ = polar.fill_sorted(ps, layers.packed, RES, poses)
    _, _, aux = polar.raycast_batched(ps, occ, return_aux=True)
    s_hit, s_tail = hit_steps(pst, *aux)

    want = np.asarray(paint_sorted(pst, s_hit, s_tail))
    got = np.asarray(paint_sorted_pallas(pst, ks, s_hit, s_tail,
                                         interpret=True))
    assert got.shape == want.shape
    assert np.array_equal(got, want), (
        f"{np.sum(got != want)} of {want.size} slots differ")


def test_paint_kernel_robot_padding(rng, statics):
    """Robot counts that are not multiples of the NR chunk pad correctly."""
    ps, pst, ks = statics
    static, obs, peds, robots = _random_scene(rng, n_rob=1, n_ped=1, n_obs=1)
    layers = _layers_from_scene(static, obs, peds, robots)
    poses = jnp.asarray(np.stack([p for p, _ in robots]), jnp.float32)

    occ = polar.fill_sorted(ps, layers.packed, RES, poses)
    _, _, aux = polar.raycast_batched(ps, occ, return_aux=True)
    s_hit, s_tail = hit_steps(pst, *aux)

    want = np.asarray(paint_sorted(pst, s_hit, s_tail))
    got = np.asarray(paint_sorted_pallas(pst, ks, s_hit, s_tail,
                                         interpret=True))
    assert np.array_equal(got, want)
