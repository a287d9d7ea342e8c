"""Scene-batched deterministic evaluation: every bank episode is a scene.

The sequential evaluator (examples/evaluate.py) steps one episode at a
time through the gym facade — ~28 s per 100-step episode through the TPU
tunnel's host round trips (50 episodes ≈ 23 min).  Here all E bank
episodes ride the scene axis of the flat multi-scene step
(parallel/batched_env.py): one reset + max_steps batched steps evaluate
the whole bank in ~100 round trips (~1 min), with identical episode draws
(the same ScenarioBank keys seed the scenes).

Reports the outcome metrics (arrive/collision/stuck rates, dones_info
codes {1,2,3,5,10}, avg arrive steps); per-step smoothness metrics
(jerk, w-variance) remain on the sequential path.

Two deliberate semantic differences from the sequential evaluator
(measured on the committed stage5_ckpt/bank50: batched 0.86/0.06/0.08
stuck in 275 s vs sequential 0.88/0.06 in 1382 s):
  * episodes that hit max_steps are labeled DONE_TIMEOUT here; the
    sequential loop leaves them outcome-less (its 'missing' 6%);
  * scenes start fresh — the sequential facade threads vw_last1 / ped
    gait phase across bank episodes (reference: the C++ node persists).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from img_env_tpu.constants import (DONE_ARRIVE, DONE_COLL_PED,
                                   DONE_COLL_ROBOT, DONE_COLL_STATIC,
                                   DONE_TIMEOUT)
from img_env_tpu.utils.metrics import batched_dones_summary


def evaluate_batched(
    cfg,
    policy_fn: Callable,          # (key, obs) -> actions [S, N, >=2]
    episodes: int,
    max_steps: int = 100,
    bank=None,                    # ScenarioBank (uses first `episodes` keys)
    seed: int = 0,
) -> Tuple[Dict, np.ndarray]:
    """Returns (summary dict, dones_info [episodes, N])."""
    import jax
    import jax.numpy as jnp

    from img_env_tpu.eval.recorder import ScenarioBank
    from img_env_tpu.parallel.batched_env import BatchedNavEnv

    if bank is None:
        bank = ScenarioBank.generate(seed, episodes)
    keys = jnp.asarray(bank.keys[:episodes])
    s = int(keys.shape[0])
    env = BatchedNavEnv(cfg, mesh=None)
    n = cfg.robot.total

    t0 = time.perf_counter()
    states, obs = env.reset(keys)
    key = jax.random.PRNGKey(seed + 1)
    dones_info = np.zeros((s, n), np.int64)
    arrive_step = np.zeros((s, n), np.int64)
    for t in range(max_steps):
        key, k = jax.random.split(key)
        actions = jnp.asarray(policy_fn(k, obs))
        if actions.shape[-1] < 3:
            actions = jnp.concatenate(
                [actions, jnp.zeros(actions.shape[:-1] + (1,))], -1)
        states, obs, reward, done, info = env.step(states, actions)
        coll = np.asarray(obs.is_collisions)
        arr = np.asarray(obs.is_arrives)
        fresh = dones_info == 0
        dones_info[fresh & (arr > 0)] = DONE_ARRIVE
        for code, val in ((1, DONE_COLL_STATIC), (2, DONE_COLL_PED),
                          (3, DONE_COLL_ROBOT)):
            dones_info[fresh & (coll == code)] = val
        arrive_step[fresh & (arr > 0)] = t + 1
        if (dones_info > 0).all():
            break
    dones_info[dones_info == 0] = DONE_TIMEOUT
    wall = time.perf_counter() - t0

    summary = batched_dones_summary(dones_info)
    arrived = dones_info == DONE_ARRIVE
    summary.update(
        episodes=s,
        avg_arrive_steps=(float(arrive_step[arrived].mean())
                          if arrived.any() else 0.0),
        wall_s=round(wall, 1),
    )
    return summary, dones_info
