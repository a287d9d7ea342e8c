"""Paper-scale experiment matrix over shared 50-episode scenario banks.

Reproduces both papers' evaluation protocols (reference README.md:159-186)
through the trusted scene-batched evaluator (eval/batched_eval.py — bit-
identical outcomes to the sequential wrapper stack,
tests/test_eval_parity.py):

  A. Sensors-20 A/B — {ckpt, mpc, random} on baseline_10obs_5ped, one
     shared bank (the committed bank50 by default), with the BagReader-
     style time/distance/extra-time comparison CSV + figures
     (eval/plots.compare_methods).
  B. IROS-21 crowd matrix — {baseline ckpt, ervo ckpt, mpc} x crowd
     strategy {pedscene, rvoscene, ervoscene} on the ervo_crowd scenario,
     all cells on the same bank, reporting ped_min_dist and the
     InfoLogWrapper 1 m close-to-human rate alongside the outcome rates.
  C. Beep ablation — the act_dim-3 ERVO checkpoint on ervoscene with the
     beep channel live vs forced OFF (the IROS-21 causal claim: beeping
     makes crowd passage safer, ervoscene.h:13-22 + img_env.cpp:323-342).

    python examples/experiment_matrix.py --episodes 50 \
        --out docs/artifacts/matrix \
        --ervo-ckpt docs/artifacts/ervo/ckpt

Writes OUT/matrix.csv (one row per cell) and OUT/compare/ (part-A figures).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_CFG = os.path.join(BASE, "img_env_tpu/configs/baseline_10obs_5ped.yaml")
ERVO_CFG = os.path.join(BASE, "img_env_tpu/configs/ervo_crowd.yaml")
BANK50 = os.path.join(BASE, "docs/artifacts/baseline_curriculum/bank50.npz")
STAGE5 = os.path.join(BASE, "docs/artifacts/baseline_curriculum/stage5_ckpt")

COLS = ["part", "config", "crowd", "method", "beep", "episodes",
        "arrive_rate", "static_coll_rate", "ped_coll_rate",
        "other_coll_rate", "stuck_rate", "avg_arrive_steps",
        "ped_min_dist_mean", "close_to_human_rate", "wall_s"]


def _ckpt_policy(cfg, ckpt_dir, episodes):
    """[S,N]-batched deterministic-mean policy from an orbax checkpoint."""
    import jax
    import jax.numpy as jnp

    from img_env_tpu.models.policy import load_ckpt_policy

    pf, params = load_ckpt_policy(cfg, ckpt_dir, episodes * cfg.robot.total)

    def policy(key, obs):
        s = obs.vector_states.shape[0]
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), obs)
        return jnp.asarray(pf(params, flat)).reshape(s, cfg.robot.total, -1)

    return policy


def _random_policy(cfg):
    import numpy as np

    rng = np.random.default_rng(0)

    def policy(key, obs):
        s = obs.vector_states.shape[0]
        return rng.uniform([0.0, -0.9], [0.6, 0.9], (s, cfg.robot.total, 2))

    return policy


def run_cell(cfg_dict, method, bank, episodes, *, ckpt=None,
             force_beep_off=False, record=False, mpc_cfg=None):
    from img_env_tpu.config import EnvConfig
    from img_env_tpu.eval.batched_eval import evaluate_batched

    cfg = EnvConfig.from_dict(dict(cfg_dict))
    kw = dict(episodes=episodes, bank=bank, record=record,
              force_beep_off=force_beep_off)
    if method == "mpc":
        from img_env_tpu.mpc import MppiConfig

        out = evaluate_batched(cfg, None, mpc=mpc_cfg or MppiConfig(
            horizon=8, samples=64), **kw)
    elif method == "random":
        out = evaluate_batched(cfg, _random_policy(cfg), **kw)
    else:   # checkpoint
        out = evaluate_batched(cfg, _ckpt_policy(cfg, ckpt, episodes), **kw)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--bank", default=BANK50)
    ap.add_argument("--out", default="docs/artifacts/matrix")
    ap.add_argument("--baseline-ckpt", default=STAGE5)
    ap.add_argument("--ervo-ckpt", default="docs/artifacts/ervo/ckpt")
    ap.add_argument("--parts", default="A,B,C")
    args = ap.parse_args()

    from img_env_tpu.config import read_yaml
    from img_env_tpu.eval.recorder import ScenarioBank

    os.makedirs(args.out, exist_ok=True)
    bank = (ScenarioBank.load(args.bank) if os.path.exists(args.bank)
            else ScenarioBank.generate(0, args.episodes))
    parts = set(args.parts.split(","))
    rows = []

    def add_row(part, config, crowd, method, beep, summary):
        rows.append({
            "part": part, "config": config, "crowd": crowd,
            "method": method, "beep": beep,
            "episodes": summary.get("episodes", 0),
            "arrive_rate": summary.get("arrive_rate", 0.0),
            "static_coll_rate": summary.get("static_coll_rate", 0.0),
            "ped_coll_rate": summary.get("ped_coll_rate", 0.0),
            "other_coll_rate": summary.get("other_coll_rate", 0.0),
            "stuck_rate": summary.get("stuck_rate", 0.0),
            "avg_arrive_steps": summary.get("avg_arrive_steps", 0.0),
            "ped_min_dist_mean": summary.get("ped_min_dist_mean", float("nan")),
            "close_to_human_rate": summary.get("close_to_human_rate",
                                               float("nan")),
            "wall_s": summary.get("wall_s", 0.0),
        })
        print(f"[{part}] {config}/{crowd}/{method}"
              f"{' beep-off' if beep == 'off' else ''}: "
              f"arrive {summary.get('arrive_rate', 0):.2f} "
              f"static {summary.get('static_coll_rate', 0):.2f} "
              f"ped {summary.get('ped_coll_rate', 0):.2f} "
              f"stuck {summary.get('stuck_rate', 0):.2f} "
              f"({summary.get('wall_s', 0):.0f}s)", flush=True)

    # ---------------- Part A: Sensors-20 A/B --------------------------
    if "A" in parts:
        base = read_yaml(BASELINE_CFG)
        recorders = {}
        for method, ckpt in (("ckpt", args.baseline_ckpt), ("mpc", None),
                             ("random", None)):
            summary, dones, rec = run_cell(
                base, method, bank, args.episodes, ckpt=ckpt, record=True)
            add_row("A", "baseline_10obs_5ped", "pedscene", method, "n/a",
                    summary)
            recorders[method] = rec
        from img_env_tpu.config import EnvConfig
        from img_env_tpu.env.nav_env import NavEnv
        from img_env_tpu.eval.plots import compare_methods

        statics = NavEnv(EnvConfig.from_dict(base)).statics
        table = compare_methods(
            recorders, os.path.join(args.out, "compare"), statics=statics)
        for name, row in table.items():
            print(f"  A-table {name:8s} {row}")

    # ---------------- Part B: IROS-21 crowd matrix ---------------------
    if "B" in parts:
        ervo = read_yaml(ERVO_CFG)
        have_ervo_ckpt = os.path.exists(args.ervo_ckpt)
        for crowd in ("pedscene", "rvoscene", "ervoscene"):
            d = dict(ervo)
            d["ped_sim"] = dict(ervo["ped_sim"], type=crowd)
            methods = [("ckpt_baseline", args.baseline_ckpt, 2),
                       ("mpc", None, 2)]
            if have_ervo_ckpt:
                methods.insert(1, ("ckpt_ervo", args.ervo_ckpt, 3))
            for method, ckpt, act_dim in methods:
                dd = dict(d)
                dd["act_dim"] = act_dim
                name = "ckpt" if method.startswith("ckpt") else method
                summary, dones = run_cell(
                    dd, name, bank, args.episodes, ckpt=ckpt)
                add_row("B", "ervo_crowd", crowd, method,
                        "policy" if act_dim == 3 else "n/a", summary)

    # ---------------- Part C: beep ablation ----------------------------
    if "C" in parts and os.path.exists(args.ervo_ckpt):
        ervo = read_yaml(ERVO_CFG)
        for beep, off in (("on", False), ("off", True)):
            summary, dones = run_cell(
                ervo, "ckpt", bank, args.episodes, ckpt=args.ervo_ckpt,
                force_beep_off=off)
            add_row("C", "ervo_crowd", "ervoscene", "ckpt_ervo", beep,
                    summary)

    path = os.path.join(args.out, "matrix.csv")
    with open(path, "w") as f:
        f.write(",".join(COLS) + "\n")
        for r in rows:
            f.write(",".join(
                f"{r[c]:.4f}" if isinstance(r[c], float) else str(r[c])
                for c in COLS) + "\n")
    print(f"wrote {path} ({len(rows)} cells x {args.episodes} episodes)")


if __name__ == "__main__":
    main()
