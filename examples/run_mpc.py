"""MPC navigation demo: MPPI controller driving robots in the jitted env.

Usage: python examples/run_mpc.py [cfg.yaml] [--steps N] [--render out.png]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cfg", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--robots", type=int, default=4)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--method", default="mppi", choices=["mppi", "ilqr"])
    ap.add_argument("--pred", default="cv", choices=["cv", "orca", "sfm"],
                    help="pedestrian prediction head")
    ap.add_argument("--render", default=None)
    ap.add_argument("--watch", type=int, default=0, metavar="K",
                    help="re-render --render every K steps (live show_gui"
                         " flavor: watch the PNG in an image viewer)")
    ap.add_argument("--gui", action="store_true",
                    help="live show_gui window (map + goal labels + view"
                         " tiles), cv2/matplotlib backend auto-picked")
    args = ap.parse_args()

    import jax

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.mpc.controller import MpcController
    from img_env_tpu.mpc.mppi import MppiConfig

    if args.cfg:
        cfg = EnvConfig.from_yaml(args.cfg)
    else:
        cfg = EnvConfig.from_dict({
            "robot": {
                "total": args.robots,
                "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
            },
            "ped_sim": {
                "total": 2, "type": "rvoscene", "max_speed": [0.5],
                "begin_poses_type": ["range"], "begin_poses": [[1.0, 9.0, 1.0, 9.0]],
                "target_poses_type": ["range"], "target_poses": [[1.0, 9.0, 1.0, 9.0]],
            },
            "global_map": {"map_file": "room_10.png", "resolution": 0.1},
            "view_map": {"resolution": 0.05, "width": 6.0, "height": 6.0},
            "range_total": 128,
            "max_ped": 2,
        })

    env = NavEnv(cfg)
    ctl = MpcController(env, MppiConfig(
        horizon=args.horizon, samples=args.samples), method=args.method,
        ped_prediction=args.pred)

    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    mstate = ctl.init_state()
    viewer = None
    if args.gui:
        from img_env_tpu.eval.live_view import LiveViewer

        viewer = LiveViewer(env.statics, cfg)
        viewer.update(state, np.asarray(obs.sensor_maps))
    d0 = float(np.linalg.norm(
        np.asarray(state.robots.goal) - np.asarray(state.robots.pose[:, :2]),
        axis=-1).mean())
    t0 = time.perf_counter()
    for t in range(args.steps):
        key, k = jax.random.split(key)
        actions, mstate, costs = ctl.act(k, state, mstate)
        state, obs, reward, done, info = env.step(state, actions)
        if (t + 1) % 10 == 0:
            d = np.linalg.norm(
                np.asarray(state.robots.goal) - np.asarray(state.robots.pose[:, :2]),
                axis=-1)
            print(f"step {t+1}: goal dists {np.round(d, 2)} "
                  f"arrive={np.asarray(state.robots.arrive).astype(int)} "
                  f"coll={np.asarray(state.robots.collision)}")
        if viewer is not None:
            viewer.update(state, np.asarray(obs.sensor_maps))
        if args.watch and args.render and (t + 1) % args.watch == 0:
            from img_env_tpu.eval.render import render_frame, save_png

            save_png(args.render, render_frame(state, env.statics))
    dt = time.perf_counter() - t0
    d1 = float(np.linalg.norm(
        np.asarray(state.robots.goal) - np.asarray(state.robots.pose[:, :2]),
        axis=-1).mean())
    arr = int(np.asarray(state.robots.arrive).sum())
    print(f"{args.steps} steps in {dt:.2f}s ({dt/args.steps*1e3:.1f} ms/step); "
          f"mean goal dist {d0:.2f} -> {d1:.2f}; arrived {arr}/{cfg.robot.total}; "
          f"collisions {np.asarray(state.robots.collision).tolist()}")

    if args.render:
        from img_env_tpu.eval.render import render_frame, save_png

        save_png(args.render, render_frame(state, env.statics))
        print("wrote", args.render)


if __name__ == "__main__":
    main()
