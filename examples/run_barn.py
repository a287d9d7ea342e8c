"""BARN benchmark driver (BarnDataSetWrapper equivalent, no Gazebo).

Usage:
    python examples/run_barn.py                      # 3 shipped worlds
    python examples/run_barn.py --generate 10        # generate 10 fresh ones
    python examples/run_barn.py --worlds DIR         # run every *.png in DIR

Runs a policy over each BARN-style occupancy world and writes the per-world
CSV plus the reference's per-episode log format
(evaluation_wrapper/BarnDataSetWrapper.py:95-105).  To benchmark the REAL
300-world BARN set, convert its .world cylinder lists to PNGs once (see
img_env_tpu/datasets/barn.py docstring) and point --worlds at the directory.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", default=None,
                    help="directory of world PNGs (default: shipped 3)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N fresh worlds into /tmp/barn_worlds")
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/barn_out")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batched", action="store_true",
                    help="all worlds as ONE compiled program (padded maps "
                         "on the scene axis; eval/barn.run_barn_suite_batched)")
    ap.add_argument("--mpc", action="store_true",
                    help="drive the MPPI controller instead of the "
                         "straight-at-goal baseline (batched mode only)")
    ap.add_argument("--chunk", type=int, default=100,
                    help="worlds per compiled program in batched mode "
                         "(equal chunks reuse one executable; 0 = all)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mpc and not args.batched:
        raise SystemExit("--mpc needs --batched (the sequential suite "
                         "drives the straight-at-goal baseline only; "
                         "silently ignoring --mpc would mislabel the CSV)")

    import bench

    bench._enable_compile_cache()   # chunked runs reuse one executable

    from img_env_tpu.config import EnvConfig
    from img_env_tpu.datasets import barn
    from img_env_tpu.eval.barn import run_barn_suite, run_barn_suite_batched

    if args.generate:
        worlds = barn.generate_worlds("/tmp/barn_worlds", n=args.generate)
    elif args.worlds:
        worlds = sorted(glob.glob(os.path.join(args.worlds, "*.png")))
    else:
        maps = os.path.join(os.path.dirname(barn.__file__), "..", "maps")
        worlds = [os.path.join(maps, f"barn_world_{i}.png") for i in range(3)]
    if not worlds:
        raise SystemExit("no worlds found")

    cfg = EnvConfig.from_dict(barn.world_cfg_dict(worlds[0]))

    def policy(key, obs):
        # straight-at-goal baseline; swap in a trained policy or MPC here
        vec = np.asarray(obs[1] if isinstance(obs, list) else
                         obs.vector_states).reshape(-1)[-3:]
        w = float(np.clip(np.arctan2(vec[1], vec[0]), -0.9, 0.9))
        return np.asarray([[0.5, w]])

    if args.batched:
        def policy_b(key, obs):
            vec = np.asarray(obs.vector_states)[..., -3:]      # [S,N,3]
            w = np.clip(np.arctan2(vec[..., 1], vec[..., 0]), -0.9, 0.9)
            return np.stack([np.full_like(w, 0.5), w], axis=-1)

        mpc_cfg = mpc_w8 = None
        if args.mpc:
            from img_env_tpu.mpc import MppiConfig
            from img_env_tpu.mpc.cost import CostWeights

            # corridor profile: geodesic goal field (global guidance — the
            # move_base global plan of the reference's BARN runs) + a
            # narrower static-safety band so sub-metre BARN passages are
            # traversable rather than cost-prohibitive
            mpc_cfg = MppiConfig(horizon=8, samples=64, goal_field=True)
            mpc_w8 = CostWeights(goal=6.0, terminal_goal=30.0,
                                 clearance=15.0, safety_dist=0.25)
        rows = run_barn_suite_batched(
            worlds, cfg, policy_b, episodes_per_world=args.episodes,
            max_steps=args.max_steps, mpc=mpc_cfg, mpc_weights=mpc_w8,
            chunk=args.chunk,
            output_csv=os.path.join(args.out, "barn_worlds.csv"))
    else:
        rows = run_barn_suite(
            worlds, cfg, policy, episodes_per_world=args.episodes,
            max_steps=args.max_steps,
            output_csv=os.path.join(args.out, "barn_worlds.csv"),
            output_txt=os.path.join(args.out, "barn_episodes.txt"))
    arr = float(np.mean([r["arrive_rate"] for r in rows]))
    print(f"worlds={len(rows)} mean arrive_rate={arr:.2f} -> {args.out}")


if __name__ == "__main__":
    main()
