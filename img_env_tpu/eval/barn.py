"""BARN-style benchmark suite: evaluate a policy over a directory of worlds.

The reference's BarnDataSetWrapper (evaluation_wrapper/BarnDataSetWrapper.py)
relaunches Gazebo for each of the 300 BARN worlds and logs per-world metrics
to CSV.  Here a "world" is an occupancy map image: the suite rebuilds the env
per world (maps differ in size, so each world compiles its own program —
identical map sizes reuse the cache), runs K episodes with the given policy,
and writes the same style of per-world CSV.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Callable, List, Optional, Sequence

import numpy as np


def run_barn_suite(
    world_files: Sequence[str],
    base_cfg,
    policy_fn: Callable,            # (key, obs_list) -> actions [N, act_dim]
    episodes_per_world: int = 3,
    max_steps: int = 200,
    output_csv: Optional[str] = None,
    seed: int = 0,
) -> List[dict]:
    """Returns per-world metric dicts; optionally writes CSV."""
    import jax

    from img_env_tpu.env.gymapi import ImgNavEnv

    rows: List[dict] = []
    for wi, wf in enumerate(world_files):
        cfg = base_cfg.replace(
            map_file=os.path.basename(wf),
            map_dir=os.path.dirname(os.path.abspath(wf)) or base_cfg.map_dir,
        )
        env = ImgNavEnv(cfg, seed=seed + wi)
        key = jax.random.PRNGKey(seed + wi)
        t0 = time.perf_counter()
        obs = env.reset()
        ep = 0
        steps = 0
        while ep < episodes_per_world and steps < max_steps * episodes_per_world:
            key, k = jax.random.split(key)
            actions = policy_fn(k, obs)
            obs, reward, done, info = env.step(actions)
            steps += 1
            if bool(np.asarray(info["all_down"])):
                ep += 1
                if not env.stack.use_never_stop:
                    obs = env.reset()
        m = env.metrics.summary()
        row = {
            "world": os.path.basename(wf),
            "episodes": m["episodes"],
            "arrive_rate": m["arrive_rate"],
            "static_coll_rate": m["static_coll_rate"],
            "ped_coll_rate": m["ped_coll_rate"],
            "stuck_rate": m["stuck_rate"],
            "avg_v": m["avg_v"],
            "avg_w": m["avg_w"],
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        rows.append(row)
        print(f"[barn] {row}")
    if output_csv and rows:
        os.makedirs(os.path.dirname(os.path.abspath(output_csv)), exist_ok=True)
        with open(output_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows
