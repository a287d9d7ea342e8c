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
