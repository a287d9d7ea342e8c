"""Transposed Pallas painter kernel vs the XLA dense decode (interpret).

The gen-2 TPU kernel (ops/pallas_paint_t.py) puts robots in lanes and
8-slot groups in sublanes; it must reproduce paint_sorted — the exact
per-ray painter trace of agent.cpp:511-624 — bit for bit.  bench.py
--selfcheck re-asserts this at the production 400x400/960 shape on the
real chip; these tests cover the kernel logic (group windows, width
buckets, class-major reorder, ex-wide fallback) on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.ops import pallas_paint_t as pt_mod
from img_env_tpu.ops import polar
from img_env_tpu.ops.painter import PainterStatics, hit_steps, paint_sorted
from img_env_tpu.ops.pallas_paint_t import (
    PaintTStatics,
    paint_sorted_pallas_t,
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
    kst = PaintTStatics.build(pst)
    return ps, pst, kst


def _thresholds(rng, ps, pst, trial):
    static, obs, peds, robots = _random_scene(rng, n_rob=5, n_ped=2, n_obs=3)
    layers = _layers_from_scene(static, obs, peds, robots)
    poses = jnp.asarray(np.stack([p for p, _ in robots]), jnp.float32)
    occ = polar.fill_sorted(ps, layers.packed, RES, poses)
    _, _, aux = polar.raycast_batched(ps, occ, return_aux=True)
    return hit_steps(pst, *aux)


@pytest.mark.parametrize("trial", range(3))
def test_paint_t_kernel_bitmatch(rng, statics, trial):
    ps, pst, kst = statics
    s_hit, s_tail = _thresholds(rng, ps, pst, trial)
    want = np.asarray(paint_sorted(pst, s_hit, s_tail))
    got = np.asarray(paint_sorted_pallas_t(kst, s_hit, s_tail,
                                           interpret=True))
    assert got.shape == want.shape
    assert np.array_equal(got, want), (
        f"{np.sum(got != want)} of {want.size} slots differ")


def test_paint_t_exwide_fallback(rng, statics, monkeypatch):
    """Groups wider than WIDE_W fall back to dense XLA rows: force a tiny
    threshold so most groups take that path and the merge still bit-matches."""
    ps, pst, _ = statics
    monkeypatch.setattr(pt_mod, "WIDE_W", 8)
    kst = PaintTStatics.build(pst)
    assert kst.wide_slots.size > 0
    s_hit, s_tail = _thresholds(rng, ps, pst, 0)
    want = np.asarray(paint_sorted(pst, s_hit, s_tail))
    got = np.asarray(paint_sorted_pallas_t(kst, s_hit, s_tail,
                                           interpret=True))
    assert np.array_equal(got, want)


def test_paint_t_exwide_padded_region(rng):
    """Regression: at full-circle FOV with R=320 beams, near-sensor regions
    get lane-padded windows (reg.W = 384 > R) AND groups spanning > WIDE_W
    beams — the ex-wide dense build must clip reg.W to R (it crashed with
    'could not broadcast (8,1024) into (8,960)' at the production shape)."""
    vp = ViewParams(
        hpx=64, wpx=64, resolution=RES, half=1.6,
        angle_begin=-3.14159, angle_end=3.14159,
        min_dist=0.0, max_dist=10.0, range_total=320, use_laser=True,
    )
    ps = polar.PolarStatics.build(vp, n_chunks=8)
    pst = PainterStatics.build(ps)
    assert any(r.W > vp.range_total for r in pst.regions), (
        "shape no longer exercises the padded-region case")
    kst = PaintTStatics.build(pst)      # crashed before the clip fix
    assert kst.wide_slots.size > 0
    s_hit, s_tail = _thresholds(rng, ps, pst, 0)
    want = np.asarray(paint_sorted(pst, s_hit, s_tail))
    got = np.asarray(paint_sorted_pallas_t(kst, s_hit, s_tail,
                                           interpret=True))
    assert np.array_equal(got, want)


def test_paint_t_entry_count_shrinks(statics):
    """The 8-slot group windows must not exceed the 64-slot block windows'
    entry count (the whole point of the transposed layout)."""
    _, pst, kst = statics
    e_block = sum(r.nb * r.W * 64 for r in pst.regions)
    e_group = sum(c.ta.shape[0] * pt_mod.G8 * c.w for c in kst.classes)
    assert e_group <= e_block

