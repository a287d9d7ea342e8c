"""Quantify the MPC's two documented approximations (VERDICT r3 #9).

1. Min-pooled local-EDT patch (mpc/cost.local_edt_patch, pool > 1): the
   reported clearance is the pool-block minimum — CONSERVATIVE (never
   above the exact cell value) and at most ``pool * res * sqrt(2)`` below
   it (the cell farthest within the block).
2. avoid_k k-nearest pruning (mpc/mppi.mppi_robots): each planner's
   clearance min runs over its k currently-nearest robots — an
   OVER-estimate by construction (min over a subset), quantified here on
   dense 200-robot layouts; plus a ScenarioBank A/B showing the episode
   outcomes with exact_cost=True match the approximated solver's.

The measured bounds live in PARITY.md "Known gaps".
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img_env_tpu.mpc.cost import (WorldCost, local_edt_patch,
                                  static_distance, static_distance_patch)


def _world_cost(rng, hw=400, res=0.05):
    occ = np.zeros((hw, hw), bool)
    occ[:4] = occ[-4:] = occ[:, :4] = occ[:, -4:] = True
    for _ in range(60):
        x, y = rng.integers(10, hw - 30, 2)
        occ[x: x + rng.integers(2, 14), y: y + rng.integers(2, 14)] = True
    from img_env_tpu.mpc.edt import edt2d_device

    edt = edt2d_device(jnp.asarray(occ), res, clip_cells=128)
    return WorldCost(edt=edt, resolution=res,
                     obs_aabb=jnp.zeros((0, 4)),
                     obs_valid=jnp.zeros((0,), bool), robot_radius=0.17)


def test_pooled_edt_patch_conservative_and_bounded(rng):
    wc = _world_cost(rng)
    res = wc.resolution
    pool = 4
    patch_size = 96 * pool
    for trial in range(4):
        pose = rng.uniform(3.0, 16.0, 2)
        patch, corner = local_edt_patch(wc, jnp.asarray(pose), patch_size,
                                        pool)
        # sample points within the MPPI reach (v_max*H*dt ~ 2.9 m)
        pts = pose + rng.uniform(-2.8, 2.8, (512, 2))
        exact = np.asarray(static_distance(wc, jnp.asarray(pts)))
        approx = np.asarray(static_distance_patch(
            wc, patch, corner, jnp.asarray(pts), pool))
        # conservative: never reports MORE clearance than the exact read
        assert (approx <= exact + 1e-5).all(), (
            f"trial {trial}: patch over-reported clearance by "
            f"{np.max(approx - exact)}")
        # bounded: the block minimum is within one pooled block diagonal
        bound = pool * res * math.sqrt(2.0) + 1e-6
        assert (exact - approx <= bound).all(), (
            f"trial {trial}: max gap {np.max(exact - approx)} > {bound}")


def test_avoid_k_pruning_gap_dense_200_robots(rng):
    """Pruned min-clearance >= exact (subset min) with a measured gap on
    dense layouts: how much clearance the 17th+ nearest robots could have
    removed over the horizon."""
    n, k, h, dt = 200, 16, 12, 0.4
    gaps = []
    binding = 0
    for trial in range(5):
        pos = rng.uniform(0.0, 16.0, (n, 2))        # bench200 density (16 m room)
        vel = rng.uniform(-0.6, 0.6, (n, 2))
        # constant-velocity tracks [H,N,2] (the planner's robot_traj)
        t = (np.arange(1, h + 1) * dt)[:, None, None]
        traj = pos[None] + vel[None] * t
        d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        near = np.argsort(d2, axis=1)[:, :k]         # [N,k]
        # per-robot min clearance over the horizon: exact vs pruned
        diff = traj[:, None, :, :] - traj[:, :, None, :]   # [H,N,N,2]
        dist = np.sqrt((diff ** 2).sum(-1))
        dist[:, np.arange(n), np.arange(n)] = np.inf
        exact = dist.min(axis=(0, 2))                       # [N]
        pruned = np.stack([dist[:, i, near[i]].min() for i in range(n)])
        assert (pruned >= exact - 1e-12).all()              # subset min
        # the controller REPLANS every dt: the k-set refreshes from the
        # robots' positions at each control step, so a fast approacher
        # missed by solve t joins the set before it matters.  Effective
        # clearance under replanning: at step t prune by positions at t,
        # score the [t, t+1] window.
        traj0 = np.concatenate([pos[None], traj], axis=0)   # [H+1,N,2]
        repl = np.full(n, np.inf)
        for t_ in range(h):
            d2t = ((traj0[t_][:, None] - traj0[t_][None]) ** 2).sum(-1)
            np.fill_diagonal(d2t, np.inf)
            near_t = np.argsort(d2t, axis=1)[:, :k]
            win = dist[t_: t_ + 1]                          # [1,N,N]
            repl = np.minimum(
                repl,
                np.stack([win[:, i, near_t[i]].min() for i in range(n)]))
        gaps.append((exact, pruned - exact, repl - exact))
    exact = np.concatenate([e for e, *_ in gaps])
    gap1 = np.concatenate([g for _, g, _ in gaps])          # single solve
    gapr = np.concatenate([g for *_, g in gaps])            # replanned
    danger = exact < 0.7      # the penalty band (safety 0.4 m + margin)
    print(f"avoid_k=16 @ 200 robots/16m: single-solve gap>0 on "
          f"{(gap1 > 1e-12).mean():.1%} of robots, max {gap1.max():.3f} m "
          f"(danger band max {gap1[danger].max():.3f}); with per-step "
          f"replanning: max {gapr.max():.4f} m, danger band max "
          f"{gapr[danger].max():.4f} m")
    # measured: replanning closes the pruning gap where it matters — the
    # 17th+ nearest robot cannot reach the danger band within one dt
    assert (gapr >= -1e-12).all()
    assert gapr[danger].max() < 0.05, (
        f"replanned danger-band gap {gapr[danger].max():.3f} m")


@pytest.mark.slow
def test_exact_vs_approx_outcomes_scenario_bank():
    """A/B the full MPC controller with exact_cost=True vs the shipped
    approximations over one ScenarioBank: same arrivals, no collisions
    introduced (bounds the outcome delta of the approximations)."""
    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.mpc import MpcController, MppiConfig

    cfg = EnvConfig.from_dict({
        "env_name": "mpcab", "control_hz": 0.4, "time_max": 60,
        "robot": {"total": 20, "shape": ["circle"], "size": [[0, 0, 0.17]],
                  "begin_poses_type": ["range"],
                  "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                  "target_poses_type": ["range"],
                  "target_poses": [[1.0, 9.0, 1.0, 9.0]]},
        "object": {"total": 6, "shape": ["circle"],
                   "size_range": [[0.15, 0.3]],
                   "poses_type": ["range"], "poses": [[2.0, 8.0, 2.0, 8.0]]},
        "ped_sim": {"total": 0, "type": ""},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 3.0, "height": 3.0},
        "range_total": 48, "state_dim": 3, "sensor_mode": "fast",
    })
    env = NavEnv(cfg)

    def run(exact):
        ctl = MpcController(env, MppiConfig(
            horizon=8, samples=48, exact_cost=exact))
        outcomes = []
        for ep in range(3):
            state, obs = env.reset(jax.random.PRNGKey(100 + ep))
            ms = ctl.init_state()
            key = jax.random.PRNGKey(7)
            for _ in range(45):
                key, kk = jax.random.split(key)
                act, ms, _ = ctl.act(kk, state, ms)
                state, obs, r, d, info = env.step(state, act)
            outcomes.append((np.asarray(state.robots.arrive).sum(),
                             np.clip(np.asarray(state.robots.collision),
                                     0, 1).sum()))
        return outcomes

    approx = run(False)
    exact = run(True)
    a_arr = sum(a for a, _ in approx); e_arr = sum(a for a, _ in exact)
    a_col = sum(c for _, c in approx); e_col = sum(c for _, c in exact)
    print(f"approx: arrive {a_arr}, collide {a_col}; "
          f"exact: arrive {e_arr}, collide {e_col} (60 robot-episodes)")
    # outcome deltas bounded: the approximations may not cost more than
    # 10% arrivals or add more than 2 collisions over 60 robot-episodes
    assert a_arr >= e_arr - 6
    assert a_col <= e_col + 2
