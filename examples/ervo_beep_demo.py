"""ERVO beep evacuation demo (IROS-21 story): peds scatter from a beeping
robot and ignore a silent one.

    python examples/ervo_beep_demo.py [--out docs/artifacts/ervo_beep_demo.png]

Two identical ERVO crowds (8 peds ringed around the robot, goals at the
ring center so they'd otherwise converge): left panel robot silent, right
panel robot beeping every step (v_y=1, ped_ca_p=1).  The trajectories are
the full env step path — beep sampling (img_env.cpp:323-342), the ERVO
evacuation term (ervoscene.h:13-22, Agent.cpp:63-69) — not the solver in
isolation.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/artifacts/ervo_beep_demo.png")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv

    m = 8
    ring = [[5 + 1.6 * math.cos(2 * math.pi * i / m),
             5 + 1.6 * math.sin(2 * math.pi * i / m),
             0.0] for i in range(m)]
    center = [[5.0, 5.0, 0.0]] * m
    cfg = EnvConfig.from_dict({
        "env_name": "beepdemo", "control_hz": 0.4, "act_dim": 3,
        "ped_ca_p": 1.0, "beep_r": 2.0,
        "robot": {"total": 1, "shape": ["circle"], "size": [[0, 0, 0.17]],
                  "begin_poses_type": ["fix"], "begin_poses": [[5.0, 5.0, 0.0]],
                  "target_poses_type": ["fix"], "target_poses": [[9.0, 5.0, 0.0]]},
        "object": {"total": 0},
        "ped_sim": {"total": m, "type": "ervoscene", "max_speed": [0.5],
                    "shape": ["circle"], "size": [[0, 0, 0.17]],
                    "begin_poses_type": ["fix"] * m, "begin_poses": ring,
                    "target_poses_type": ["fix"] * m, "target_poses": center,
                    "go_back": "no"},
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
        "range_total": 64, "max_ped": m, "state_dim": 3,
        "sensor_mode": "fast",
    })
    env = NavEnv(cfg)

    def rollout(beep: float):
        state, _ = env.reset(jax.random.PRNGKey(0))
        acts = jnp.asarray([[0.0, 0.0, beep]])
        traj = [np.asarray(state.peds.pos).copy()]
        beeps = 0
        for _ in range(args.steps):
            state, obs, r, d, info = env.step(state, acts)
            beeps += int(np.asarray(info["beeps"]).sum())
            traj.append(np.asarray(state.peds.pos).copy())
        return np.stack(traj), beeps

    silent, b0 = rollout(0.0)
    beeping, b1 = rollout(1.0)
    assert b0 == 0 and b1 == args.steps, (b0, b1)
    d_sil = np.linalg.norm(silent[-1] - [5, 5], axis=-1)
    d_bee = np.linalg.norm(beeping[-1] - [5, 5], axis=-1)
    print(f"final mean dist to robot: silent {d_sil.mean():.2f} m, "
          f"beeping {d_bee.mean():.2f} m ({b1} beeps fired)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4.4), sharex=True, sharey=True)
    for ax, traj, title, dm in (
            (axes[0], silent, "silent robot", d_sil.mean()),
            (axes[1], beeping, f"beeping robot (r={cfg.beep_r} m)",
             d_bee.mean())):
        for p in range(m):
            ax.plot(traj[:, p, 0], traj[:, p, 1], "-", lw=1.2, color="tab:green",
                    alpha=0.8)
            ax.plot(traj[0, p, 0], traj[0, p, 1], "o", ms=4, color="tab:green")
            ax.plot(traj[-1, p, 0], traj[-1, p, 1], "s", ms=4, color="darkgreen")
        c = plt.Circle((5, 5), cfg.beep_r, fill=False, ls="--",
                       color="tab:red" if "beep" in title else "gray")
        ax.add_patch(c)
        ax.plot([5], [5], "*", ms=14, color="tab:blue")
        ax.set_title(f"{title}\nmean final dist {dm:.2f} m")
        ax.set_aspect("equal")
        ax.set_xlim(2.2, 7.8); ax.set_ylim(2.2, 7.8)
    fig.suptitle("ERVO evacuation: peds converge on a silent robot, "
                 "scatter from a beeping one (full env path)")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
