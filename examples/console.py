"""Interactive debug console — the DRLConsole analogue (comn_pkg/src/
drl_console.cpp:16-76, wired-but-disabled in the reference).

    python examples/console.py [cfg.yaml]

Commands:
    reset [seed]        new episode
    step [v w]          step all robots with (v, w) (default 0.3 0.0)
    peek robots|peds|obs   print state slices
    render [file.png]   write a frame
    metrics             episode metrics so far
    quit
"""

from __future__ import annotations

import os
import shlex
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.gymapi import ImgNavEnv

    cfg = (EnvConfig.from_yaml(sys.argv[1]) if len(sys.argv) > 1
           else EnvConfig())
    env = ImgNavEnv(cfg)
    obs = env.reset()
    print(f"env up: {cfg.robot.total} robots, {cfg.ped_sim.total} peds. "
          f"type 'help' for commands.")

    while True:
        try:
            line = input("img_env> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        cmd, *args = shlex.split(line)
        if cmd in ("quit", "exit", "q"):
            break
        elif cmd == "help":
            print(__doc__)
        elif cmd == "reset":
            env._key = jax.random.PRNGKey(int(args[0]) if args else 0)
            obs = env.reset()
            print("reset ok")
        elif cmd == "step":
            v = float(args[0]) if args else 0.3
            w = float(args[1]) if len(args) > 1 else 0.0
            acts = np.tile([v, w], (env.robot_total, 1))
            obs, reward, done, info = env.step(acts)
            print(f"reward={np.round(np.asarray(reward), 2)} "
                  f"done={np.asarray(done)} "
                  f"dones_info={np.asarray(info['dones_info'])}")
        elif cmd == "peek":
            st = env._state
            what = args[0] if args else "robots"
            if what == "robots":
                print("pose:\n", np.round(np.asarray(st.robots.pose), 3))
                print("goal:\n", np.round(np.asarray(st.robots.goal), 3))
                print("collision:", np.asarray(st.robots.collision),
                      "arrive:", np.asarray(st.robots.arrive))
            elif what == "peds":
                print("pos:\n", np.round(np.asarray(st.peds.pos), 3))
                print("vel:\n", np.round(np.asarray(st.peds.vel), 3))
            else:
                m = np.asarray(st.obs_map)
                print(f"obs_map {m.shape}, occupied cells: {(m < 250).sum()}")
        elif cmd == "render":
            from img_env_tpu.eval.render import render_frame, save_png

            out = args[0] if args else "/tmp/img_env_frame.png"
            save_png(out, render_frame(env._state, env.core.statics))
            print("wrote", out)
        elif cmd == "metrics":
            print(env.metrics.summary())
        else:
            print(f"unknown command {cmd!r}; try 'help'")


if __name__ == "__main__":
    main()
