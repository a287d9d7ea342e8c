"""Offline episode analysis plots — the BagReader figure suite
(envs/utils/bag/bag.py:897-1109) over EpisodeRecorder npz records.

All functions take an ``EpisodeRecorder`` (or its loaded npz) and render
matplotlib figures: trajectory overlays on the map, velocity profiles,
outcome summaries.  Import is lazy so headless training never pays for
matplotlib.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectories(recorder, statics=None, out: Optional[str] = None,
                      max_episodes: int = 20):
    """Robot (and ped) trajectories of each episode, overlaid on the map."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 7))
    if statics is not None:
        occ = np.asarray(statics.static_map) < 250
        res = float(statics.resolution)
        ax.imshow(
            ~occ, cmap="gray", origin="lower",
            extent=(0, occ.shape[1] * res, 0, occ.shape[0] * res), alpha=0.6)
    for e in recorder.episodes[:max_episodes]:
        if not e.robot_poses:
            continue
        poses = np.asarray(e.robot_poses)     # [T,N,3]
        for i in range(poses.shape[1]):
            ax.plot(poses[:, i, 1], poses[:, i, 0], lw=1.2)
            ax.plot(poses[0, i, 1], poses[0, i, 0], "g^", ms=5)
            ax.plot(poses[-1, i, 1], poses[-1, i, 0], "r*", ms=7)
        peds = np.asarray(e.ped_poses)
        if peds.size:
            for j in range(peds.shape[1]):
                ax.plot(peds[:, j, 1], peds[:, j, 0], "--", lw=0.7, alpha=0.5)
    ax.set_xlabel("y [m]")
    ax.set_ylabel("x [m]")
    ax.set_title("episode trajectories")
    ax.set_aspect("equal")
    if out:
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out
    return fig


def plot_vw_curves(recorder, episode: int = 0, out: Optional[str] = None):
    """v / w command curves for one episode (bag.py vw plots)."""
    plt = _plt()
    e = recorder.episodes[episode]
    vw = np.asarray(e.robot_vws)             # [T,N,2]
    t = np.arange(vw.shape[0]) * recorder.dt
    fig, (a1, a2) = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    for i in range(vw.shape[1]):
        a1.plot(t, vw[:, i, 0], label=f"robot {i}")
        a2.plot(t, vw[:, i, 1])
    a1.set_ylabel("v [m/s]")
    a2.set_ylabel("w [rad/s]")
    a2.set_xlabel("t [s]")
    a1.legend(loc="upper right", fontsize=7)
    if out:
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out
    return fig


def plot_outcomes(recorder, out: Optional[str] = None):
    """Bar chart of dones_info outcomes across episodes."""
    plt = _plt()
    names = {1: "static coll", 2: "ped coll", 3: "robot coll",
             5: "arrive", 10: "timeout"}
    counts = {k: 0 for k in names}
    for e in recorder.episodes:
        if e.dones_info is None:
            continue
        for d in np.asarray(e.dones_info).reshape(-1):
            if int(d) in counts:
                counts[int(d)] += 1
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.bar([names[k] for k in counts], list(counts.values()))
    ax.set_ylabel("episodes")
    if out:
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out
    return fig


# ---------------------------------------------------------------------------
# BagReader indicator + multi-method comparison surface (bag.py:897-1109)
# ---------------------------------------------------------------------------


def per_robot_indicators(recorder, v_max: float = 0.6,
                         reach_th: float = 0.3) -> dict:
    """Per-robot + aggregate indicator table (BagReader.cal_indicator).

    Mirrors bag.py:897-1040: rates over arrive+collision outcomes, stuck
    rate over all episodes, and — conditioned on ARRIVED robots — arrival
    time/distance and the extra time/distance beyond the straight
    start->goal optimum (minus reach_th, at v_max).  v/w stats pool the
    arrived robots' command curves.
    """
    eps = [e for e in recorder.episodes if e.robot_poses]
    if not eps:
        return {}
    n = np.asarray(eps[0].robot_poses).shape[1]
    arr = np.zeros(n, int)
    coll = np.zeros(n, int)
    stuck = np.zeros(n, int)
    times = [[] for _ in range(n)]
    dists = [[] for _ in range(n)]
    extra_t = [[] for _ in range(n)]
    extra_d = [[] for _ in range(n)]
    vs, ws = [], []
    for e in eps:
        poses = np.asarray(e.robot_poses)          # [T,N,3]
        vws = np.asarray(e.robot_vws)
        done = (np.asarray(e.dones_info).reshape(-1)
                if e.dones_info is not None else np.zeros(n))
        for i in range(n):
            d = int(done[i]) if done.size > i else 0
            if d in (1, 2, 3):
                coll[i] += 1
                continue
            if d == 10:
                stuck[i] += 1
                continue
            if e.goals is None:
                continue
            goal = np.asarray(e.goals)[i]
            gd = np.linalg.norm(poses[:, i, :2] - goal, axis=-1)
            hit = np.nonzero(gd <= reach_th)[0]
            if d != 5 and hit.size == 0:
                continue
            arr[i] += 1
            t_end = int(hit[0]) + 1 if hit.size else poses.shape[0]
            seg = np.linalg.norm(np.diff(poses[:t_end, i, :2], axis=0),
                                 axis=-1)
            path = float(seg.sum())
            t_arr = t_end * recorder.dt
            straight = float(np.linalg.norm(goal - poses[0, i, :2])) - reach_th
            times[i].append(t_arr)
            dists[i].append(path)
            extra_t[i].append(t_arr - straight / v_max)
            extra_d[i].append(path - straight)
            if vws.size:
                vs += list(vws[:t_end, i, 0])
                ws += list(vws[:t_end, i, 1])

    def _ms(x):
        x = np.asarray(x, np.float64)
        return (float(x.mean()), float(x.std())) if x.size else (0.0, 0.0)

    rows = {}
    for i in range(n):
        den = max(arr[i] + coll[i], 1)
        rows[i] = {
            "arrive_rate": arr[i] / den,
            "collision_rate": coll[i] / den,
            "stuck_rate": stuck[i] / len(eps),
            "time": _ms(times[i]),
            "distance": _ms(dists[i]),
            "extra_time": _ms(extra_t[i]),
            "extra_distance": _ms(extra_d[i]),
        }
    den = max(arr.sum() + coll.sum(), 1)
    rows["all"] = {
        "arrive_rate": arr.sum() / den,
        "collision_rate": coll.sum() / den,
        "stuck_rate": stuck.sum() / (len(eps) * n),
        "time": _ms(sum(times, [])),
        "distance": _ms(sum(dists, [])),
        "extra_time": _ms(sum(extra_t, [])),
        "extra_distance": _ms(sum(extra_d, [])),
        "v": _ms(vs),
        "w": _ms(ws),
    }
    return rows


def compare_methods(recorders: dict, out_dir: str, statics=None,
                    v_max: float = 0.6, reach_th: float = 0.3) -> dict:
    """Multi-method A/B comparison (the BagReader multi-bag workflow).

    recorders: {method_name: EpisodeRecorder} recorded on the SAME
    scenario bank (cfg_type 'bag' replay).  Writes per-method trajectory
    figures, a combined v/w figure, a comparison bar figure and a csv/txt
    table under out_dir; returns {method: aggregate indicator row}.
    """
    import os

    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    table = {}
    for name, rec in recorders.items():
        plot_trajectories(rec, statics,
                          out=os.path.join(out_dir, f"traj_{name}.png"))
        if rec.episodes and rec.episodes[0].robot_vws:
            plot_vw_curves(rec, 0, out=os.path.join(out_dir, f"vw_{name}.png"))
        table[name] = per_robot_indicators(rec, v_max, reach_th)["all"]

    metrics = ["arrive_rate", "collision_rate", "stuck_rate"]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    names = list(table)
    for k in metrics:
        axes[0].bar([f"{n}\n{k}" for n in names],
                    [table[n][k] for n in names], label=k)
    axes[0].set_title("outcome rates")
    width = 0.35
    xs = np.arange(len(names))
    axes[1].bar(xs - width / 2, [table[n]["extra_time"][0] for n in names],
                width, yerr=[table[n]["extra_time"][1] for n in names],
                label="extra time [s]")
    axes[1].bar(xs + width / 2,
                [table[n]["extra_distance"][0] for n in names], width,
                yerr=[table[n]["extra_distance"][1] for n in names],
                label="extra distance [m]")
    axes[1].set_xticks(xs)
    axes[1].set_xticklabels(names)
    axes[1].legend()
    axes[1].set_title("efficiency (arrived episodes)")
    fig.savefig(os.path.join(out_dir, "comparison.png"), dpi=120,
                bbox_inches="tight")
    plt.close(fig)

    cols = ["arrive_rate", "collision_rate", "stuck_rate", "time",
            "distance", "extra_time", "extra_distance", "v", "w"]
    lines = ["method," + ",".join(
        c if c.endswith("rate") else f"{c}_mean,{c}_std" for c in cols)]
    for name in names:
        row = [name]
        for c in cols:
            val = table[name].get(c, 0.0)
            if isinstance(val, tuple):
                row += [f"{val[0]:.4f}", f"{val[1]:.4f}"]
            else:
                row.append(f"{val:.4f}")
        lines.append(",".join(row))
    with open(os.path.join(out_dir, "comparison.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return table
