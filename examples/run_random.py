"""Random-policy smoke driver — the analogue of the reference env_test.py.

Usage:
    python examples/run_random.py [cfg.yaml] [--episodes N] [--render out.png]

Builds the env from a yaml (reference configs load unchanged), runs the same
uniform random policy as env_test.py:22-42 (v ~ U[0,0.6], w ~ U[-0.9,0.9]),
prints episode metrics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class RandomPolicy4Nav:
    def __init__(self, n: int, v_range=(0.0, 0.6), w_range=(-0.9, 0.9),
                 seed=0, n_discrete: int = 0):
        self.n = n
        self.v_range, self.w_range = v_range, w_range
        self.rng = np.random.default_rng(seed)
        self.n_discrete = n_discrete

    def gen_action(self):
        if self.n_discrete:
            return self.rng.integers(0, self.n_discrete, self.n)
        v = self.rng.uniform(*self.v_range, self.n)
        w = self.rng.uniform(*self.w_range, self.n)
        return np.stack([v, w], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cfg", nargs="?", default=None)
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--render", default=None)
    args = ap.parse_args()

    from img_env_tpu import make_env
    from img_env_tpu.config import EnvConfig

    if args.cfg:
        env = make_env(args.cfg)
    else:
        env = make_env(EnvConfig())

    policy = RandomPolicy4Nav(
        env.robot_total,
        n_discrete=len(env.cfg.discrete_actions) if env.cfg.discrete_action else 0)
    obs = env.reset()
    t0 = time.perf_counter()
    steps, episodes = 0, 0
    while episodes < args.episodes:
        actions = policy.gen_action()
        obs, reward, done, info = env.step(actions)
        steps += 1
        if bool(np.asarray(info["all_down"])) or steps % args.max_steps == 0:
            episodes += 1
            if not env.stack.use_never_stop:
                obs = env.reset()
    dt = time.perf_counter() - t0
    print(f"{steps} steps / {episodes} episodes in {dt:.2f}s "
          f"({steps * env.robot_total / dt:.0f} robot-steps/s)")
    print("metrics:", env.metrics.summary())

    if args.render:
        from img_env_tpu.eval.render import render_frame, save_png

        img = render_frame(env._state, env.core.statics)
        save_png(args.render, img)
        print("wrote", args.render)


if __name__ == "__main__":
    main()
