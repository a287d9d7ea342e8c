"""Multi-method A/B comparison over one fixed scenario bank.

The reference workflow records one rosbag per method on identical episode
draws, then BagReader renders comparison figures and the cal_indicator
table (envs/utils/bag/bag.py).  Here the bank is a ScenarioBank of PRNG
keys, each method replays the SAME episode sequence, and
eval/plots.compare_methods writes the per-method trajectory figures, the
comparison bar figure and the indicator csv/txt.

    python examples/compare_methods.py [cfg.yaml] --episodes 6 \
        --methods mpc,random --out /tmp/compare
    python examples/compare_methods.py img_env_tpu/configs/easy_train.yaml \
        --methods mpc,ckpt --ckpt /tmp/ckpt --out /tmp/compare
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cfg", nargs="?", default="img_env_tpu/configs/test.yaml")
    ap.add_argument("--episodes", type=int, default=6)
    ap.add_argument("--max-steps", type=int, default=60)
    ap.add_argument("--methods", default="mpc,random",
                    help="comma list of mpc | random | ckpt")
    ap.add_argument("--ckpt", default="",
                    help="orbax dir from train_ppo --save (for 'ckpt')")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/compare_methods")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from img_env_tpu.config import read_yaml
    from img_env_tpu.env.gymapi import make_env
    from img_env_tpu.eval.plots import compare_methods
    from img_env_tpu.eval.recorder import ScenarioBank

    bank_path = f"{args.out}_bank.npz"
    ScenarioBank.generate(args.seed, args.episodes).save(bank_path)

    recorders = {}
    statics = None
    for method in args.methods.split(","):
        method = method.strip()
        d = read_yaml(args.cfg)
        d["cfg_type"] = "bag"
        d["init_pose_bag_name"] = bank_path
        d["init_pose_bag_episodes"] = args.episodes
        d["wrapper"] = [w for w in d.get("wrapper", [])
                        if w != "NeverStopWrapper"]
        d["discrete_action"] = False
        env = make_env(d, seed=0, record=True)
        n = env.robot_total
        statics = env.core.statics

        ctl = policy_fn = params = None
        if method == "mpc":
            from img_env_tpu.mpc import MpcController, MppiConfig

            ctl = MpcController(env.core, MppiConfig(horizon=8, samples=64))
        elif method == "ckpt":
            from img_env_tpu.models.policy import load_ckpt_policy

            policy_fn, params = load_ckpt_policy(env.core.cfg, args.ckpt, n)
        elif method != "random":
            sys.exit(f"unknown method {method!r}")

        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        for _ in range(args.episodes):
            env.reset(carry=False)
            ms = ctl.init_state() if ctl else None
            info = None
            for _ in range(args.max_steps):
                if ctl is not None:
                    key, k = jax.random.split(key)
                    actions, ms, _ = ctl.act(k, env._state, ms)
                    actions = np.asarray(actions)[:, :2]
                elif policy_fn is not None:
                    actions = np.asarray(policy_fn(params, env.last_raw_obs))
                else:
                    actions = np.column_stack([
                        rng.uniform(0.0, 0.6, n), rng.uniform(-0.9, 0.9, n)])
                _, _, _, info = env.step(actions)
                if bool(np.asarray(info["all_down"])):
                    break
            env.recorder.end_episode(np.asarray(info["dones_info"]))
        print(f"{method}: {args.episodes} episodes in "
              f"{time.perf_counter() - t0:.1f}s")
        recorders[method] = env.recorder

    table = compare_methods(recorders, args.out, statics=statics)
    for name, row in table.items():
        print(f"  {name:8s} {row}")
    print(f"figures + csv under {args.out}/")


if __name__ == "__main__":
    main()
