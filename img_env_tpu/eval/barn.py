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
    output_txt: Optional[str] = None,
    seed: int = 0,
) -> List[dict]:
    """Returns per-world metric dicts; optionally writes a per-world CSV and
    the reference's per-episode log (BarnDataSetWrapper.out2logfile format:
    ``world, arrive, static_collision, stuck, v_avg, w_avg, v_acc, w_acc,
    v_jerk, w_jerk, w_zero, path_time, steps``)."""
    import jax

    from img_env_tpu.env.gymapi import ImgNavEnv
    from img_env_tpu.utils.trajectory import TrajectoryStats

    rows: List[dict] = []
    ep_lines: List[str] = []
    for wi, wf in enumerate(world_files):
        cfg = base_cfg.replace(
            map_file=os.path.basename(wf),
            map_dir=os.path.dirname(os.path.abspath(wf)) or base_cfg.map_dir,
        )
        env = ImgNavEnv(cfg, seed=seed + wi)
        key = jax.random.PRNGKey(seed + wi)
        traj = TrajectoryStats(dt=float(cfg.control_hz))
        t0 = time.perf_counter()
        obs = env.reset()
        ep = 0
        steps = 0
        while ep < episodes_per_world and steps < max_steps * episodes_per_world:
            key, k = jax.random.split(key)
            actions = policy_fn(k, obs)
            obs, reward, done, info = env.step(actions)
            speeds = np.asarray(info["speeds"])
            traj.add_vw(speeds[0, 0], speeds[0, 1])   # robot 0, like the ref
            steps += 1
            if bool(np.asarray(info["all_down"])):
                ep += 1
                di = int(np.asarray(info["dones_info"]).reshape(-1)[0])
                md = traj.metric_dict()
                md.update(cur_world=os.path.basename(wf),
                          arrive=int(di == 5), static_collision=int(di == 1),
                          stuck=int(di == 10))
                ep_lines.append(
                    "{cur_world}, {arrive}, {static_collision}, {stuck}, "
                    "{v_avg}, {w_avg}, {v_acc}, {w_acc}, {v_jerk}, "
                    "{w_jerk}, {w_zero}, {path_time}, {steps}".format_map(md))
                traj.clear()
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
    if output_txt and ep_lines:
        # overwrite like the csv: re-running the suite must not mix runs
        # (the reference's BarnDataSetWrapper appends because each world is
        # a separate process; here one call covers the whole suite)
        os.makedirs(os.path.dirname(os.path.abspath(output_txt)), exist_ok=True)
        with open(output_txt, "w") as f:
            f.write("\n".join(ep_lines) + "\n")
    return rows


def run_barn_suite_batched(
    world_files: Sequence[str],
    base_cfg,
    policy_fn: Optional[Callable] = None,  # (key, obs) -> actions [S, N, >=2]
    episodes_per_world: int = 3,
    max_steps: int = 200,
    output_csv: Optional[str] = None,
    seed: int = 0,
    mpc=None,                       # MppiConfig -> drive the MPC controller
    mpc_weights=None,               # CostWeights override (corridor tuning)
    chunk: int = 0,                 # >0: worlds per compiled program
) -> List[dict]:
    """All worlds step as ONE compiled program (heterogeneous scene
    batching): the world maps are padded to a common shape (pad cells =
    occupied) and ride the scene axis of BatchedNavEnv via
    ``reset(..., static_maps=...)``.  The reference launches a separate
    Gazebo per world (BarnDataSetWrapper); the sequential
    ``run_barn_suite`` above recompiles per distinct map size.  Returns
    the same per-world metric rows.
    """
    import jax
    import jax.numpy as jnp

    from img_env_tpu.env import maps as maps_mod
    from img_env_tpu.parallel.batched_env import BatchedNavEnv

    if chunk and len(world_files) > chunk:
        # protocol-scale runs (the reference's 300 BARN worlds,
        # BarnDataSetWrapper.py:32) in fixed-size compiled programs: equal
        # chunk shapes reuse one executable across all chunks
        rows: List[dict] = []
        for c0 in range(0, len(world_files), chunk):
            rows += run_barn_suite_batched(
                world_files[c0:c0 + chunk], base_cfg, policy_fn,
                episodes_per_world, max_steps, None, seed + c0, mpc=mpc,
                mpc_weights=mpc_weights)
        if output_csv and rows:
            os.makedirs(os.path.dirname(os.path.abspath(output_csv)),
                        exist_ok=True)
            with open(output_csv, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
        return rows

    s = len(world_files)
    cfg = base_cfg.replace(
        map_file=os.path.basename(world_files[0]),
        map_dir=(os.path.dirname(os.path.abspath(world_files[0]))
                 or base_cfg.map_dir))
    loaded = [maps_mod.load_static_map(cfg.replace(
        map_file=os.path.basename(w),
        map_dir=os.path.dirname(os.path.abspath(w)) or cfg.map_dir,
    )) for w in world_files]
    hm = max(m.shape[0] for m in loaded)
    wm = max(m.shape[1] for m in loaded)
    maps = np.zeros((s, hm, wm), loaded[0].dtype)   # pad = 0 (occupied)
    for i, m in enumerate(loaded):
        maps[i, : m.shape[0], : m.shape[1]] = m

    env = BatchedNavEnv(cfg, mesh=None)
    n = cfg.robot.total
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    maps_j = jnp.asarray(maps)
    states, obs = env.reset(jax.random.split(k0, s), static_maps=maps_j)

    ctl = None
    if mpc is not None:
        from img_env_tpu.mpc.controller import MpcController

        ctl = MpcController(env.core, mpc, weights=mpc_weights)
        ms0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (s,) + x.shape), ctl.init_state())
        mss = ms0

        @jax.jit
        def mpc_act(key, states, mss):
            kk = jax.random.split(key, s)
            actions, mss, _ = jax.vmap(ctl.act_fn)(kk, states, mss)
            return actions, mss

    t0 = time.perf_counter()
    ep_done = np.zeros(s, np.int64)
    arrive = np.zeros(s, np.int64)
    s_coll = np.zeros(s, np.int64)
    p_coll = np.zeros(s, np.int64)
    stuck = np.zeros(s, np.int64)
    elapsed = np.zeros(s, np.int64)
    steps = 0
    while (ep_done < episodes_per_world).any() and steps < (
            max_steps * episodes_per_world * 2):
        key, k = jax.random.split(key)
        if ctl is not None:
            actions, mss = mpc_act(k, states, mss)
        else:
            actions = jnp.asarray(policy_fn(k, obs))
        if actions.shape[-1] < 3:
            actions = jnp.concatenate(
                [actions, jnp.zeros(actions.shape[:-1] + (1,))], -1)
        states, obs, reward, done, info = env.step(states, actions)
        steps += 1
        elapsed += 1
        coll = np.asarray(obs.is_collisions)        # [S, N]
        arr = np.asarray(obs.is_arrives)
        # per-world episode end: every robot down, or per-world time limit
        down = ((np.clip(coll, 0, 1) + arr) > 0).all(axis=1)
        timeout = elapsed >= max_steps
        fin = (down | timeout) & (ep_done < episodes_per_world)
        if fin.any():
            for i in np.nonzero(fin)[0]:
                ep_done[i] += 1
                arrive[i] += int(arr[i].all())
                s_coll[i] += int((coll[i] == 1).any())
                p_coll[i] += int((coll[i] == 2).any())
                stuck[i] += int(timeout[i] and not down[i])
            # re-draw finished worlds (same per-world map), keep others
            key, kr = jax.random.split(key)
            rstates, robs = env.reset(
                jax.random.split(kr, s), carry=states, static_maps=maps_j)
            m = jnp.asarray(fin)
            pick = lambda new, old: jnp.where(
                m.reshape((s,) + (1,) * (new.ndim - 1)), new, old)
            states = jax.tree_util.tree_map(pick, rstates, states)
            obs = jax.tree_util.tree_map(pick, robs, obs)
            if ctl is not None:   # fresh MPC warm-start for re-drawn worlds
                mss = jax.tree_util.tree_map(pick, ms0, mss)
            elapsed[fin] = 0
    wall = time.perf_counter() - t0

    rows = []
    for i, wf in enumerate(world_files):
        e = max(int(ep_done[i]), 1)
        rows.append({
            "world": os.path.basename(wf),
            "episodes": int(ep_done[i]),
            "arrive_rate": arrive[i] / e,
            "static_coll_rate": s_coll[i] / e,
            "ped_coll_rate": p_coll[i] / e,
            "stuck_rate": stuck[i] / e,
            "avg_v": float("nan"),
            "avg_w": float("nan"),
            "wall_s": round(wall, 2),
        })
        print(f"[barn-batched] {rows[-1]}")
    if output_csv and rows:
        os.makedirs(os.path.dirname(os.path.abspath(output_csv)),
                    exist_ok=True)
        with open(output_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows
