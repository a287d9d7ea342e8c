"""Scenario sampler: multi-region pose types + bounded re-draw recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.sampler import (
    SamplerSpec,
    sample_scenario,
    sample_scenario_retry,
)

REGIONS = [[1.0, 3.0, 1.0, 3.0], [7.0, 9.0, 1.0, 3.0], [1.0, 3.0, 7.0, 9.0]]


def _cfg(robot=None, ped=None, extra=None):
    d = {
        "robot": robot or {
            "total": 1,
            "begin_poses_type": ["range"],
            "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
            "target_poses_type": ["range"],
            "target_poses": [[1.0, 9.0, 1.0, 9.0]],
        },
        "ped_sim": ped or {"total": 0},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
    }
    d.update(extra or {})
    return EnvConfig.from_dict(d)


def _in_region(xy, reg):
    return (reg[0] <= xy[0] <= reg[1]) and (reg[2] <= xy[1] <= reg[3])


def test_multi_regions_cover_all():
    """range_multi begin poses sample from every configured region."""
    cfg = _cfg(robot={
        "total": 1,
        "begin_poses_type": ["range_multi"],
        "begin_poses": [REGIONS],
        "target_poses_type": ["range_multi"],
        "target_poses": [REGIONS],
    }, extra={"target_min_dist": 1.0})
    spec = SamplerSpec.from_config(cfg)
    assert spec.begin_params.shape[1] == 3 and spec.begin_nreg[0] == 3

    fn = jax.jit(lambda k: sample_scenario(k, spec))
    hits = np.zeros(3, np.int64)
    for seed in range(60):
        s = fn(jax.random.PRNGKey(seed))
        pose = np.asarray(s.init_poses[0])
        goal = np.asarray(s.target_poses[0])
        which = [i for i, r in enumerate(REGIONS) if _in_region(pose, r)]
        assert which, f"pose {pose} outside all regions"
        hits[which[0]] += 1
        assert any(_in_region(goal, r) for r in REGIONS), goal
    assert (hits > 0).all(), f"region pick counts {hits}"


def test_multi_single_region_matches_range():
    """A one-element multi list behaves like plain range."""
    cfg_m = _cfg(robot={
        "total": 1,
        "begin_poses_type": ["range_multi"],
        "begin_poses": [[[2.0, 8.0, 2.0, 8.0]]],
        "target_poses_type": ["range"],
        "target_poses": [[2.0, 8.0, 2.0, 8.0]],
    })
    spec = SamplerSpec.from_config(cfg_m)
    s = sample_scenario(jax.random.PRNGKey(3), spec)
    p = np.asarray(s.init_poses[0])
    assert 2.0 <= p[0] <= 8.0 and 2.0 <= p[1] <= 8.0
    assert bool(s.ok)


CIRCLE_AGENTS = 8


def _crowded_circle_cfg(trials):
    """Tight circle with many agents: single-draw placement often fails."""
    return _cfg(
        robot={
            "total": CIRCLE_AGENTS,
            "begin_poses_type": ["range_circle"],
            "begin_poses": [[5.0, 5.0]],
            "target_poses_type": ["range_circle"],
            "target_poses": [[5.0, 5.0]],
        },
        extra={"circle_ranges": [2.0, 2.2], "reset_trials": trials,
               "reset_redraws": 12, "target_min_dist": 1.0},
    )


def test_crowded_circle_clearance_100_resets():
    """Pairwise start clearance > 1 m on 100 seeded resets (with re-draws)."""
    cfg = _crowded_circle_cfg(trials=24)
    spec = SamplerSpec.from_config(cfg)
    fn = jax.jit(lambda k: sample_scenario_retry(k, spec))
    ok_count = 0
    for seed in range(100):
        s = fn(jax.random.PRNGKey(seed))
        if not bool(s.ok):
            continue  # clearance only guaranteed for ok samples
        ok_count += 1
        xy = np.asarray(s.init_poses[:, :2])
        d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
        d[np.arange(CIRCLE_AGENTS), np.arange(CIRCLE_AGENTS)] = np.inf
        assert d.min() > 1.0, f"seed {seed}: min pairwise {d.min():.3f}"
    # the re-draw loop must rescue nearly every seed
    assert ok_count >= 97, f"only {ok_count}/100 seeds placed cleanly"


def test_retry_rescues_failing_draws():
    """Seeds whose FIRST draw fails are fixed by the bounded re-draw."""
    cfg = _crowded_circle_cfg(trials=6)   # few trials -> frequent failures
    spec = SamplerSpec.from_config(cfg)
    one = jax.jit(lambda k: sample_scenario(k, spec))
    retry = jax.jit(lambda k: sample_scenario_retry(k, spec))
    failed_first = rescued = 0
    for seed in range(40):
        k = jax.random.PRNGKey(seed)
        if not bool(one(k).ok):
            failed_first += 1
            if bool(retry(k).ok):
                rescued += 1
    assert failed_first > 0, "scenario not crowded enough to exercise retry"
    assert rescued >= failed_first * 0.8


def test_retry_deterministic():
    cfg = _crowded_circle_cfg(trials=6)
    spec = SamplerSpec.from_config(cfg)
    k = jax.random.PRNGKey(11)
    a = sample_scenario_retry(k, spec)
    b = sample_scenario_retry(k, spec)
    np.testing.assert_array_equal(np.asarray(a.init_poses),
                                  np.asarray(b.init_poses))
