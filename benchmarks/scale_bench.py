"""Scene-batched env + PPO training throughput (honest timings).

The reference scales by launching one ROS node per scene; here S scenes
step as one XLA program (parallel/batched_env.py).  Reports aggregate
robot-steps/s for the env and env-steps/s inside the full PPO update.
"""
import dataclasses
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from benchmarks.timing import fetch_ms, rtt_ms


def build_cfg(robots: int, peds: int):
    from img_env_tpu.config import EnvConfig

    return EnvConfig.from_dict({
        "env_name": "scale",
        "control_hz": 0.4,
        "robot": {
            "total": robots, "shape": ["circle"], "size": [[0.0, 0.0, 0.17]],
            "begin_poses_type": ["range"], "begin_poses": [[0.5, 9.5, 0.5, 9.5]],
            "target_poses_type": ["range"], "target_poses": [[0.5, 9.5, 0.5, 9.5]],
        },
        "object": {"total": 4, "shape": ["circle"], "size_range": [[0.1, 0.2]],
                   "poses_type": ["range"], "poses": [[0.5, 9.5, 0.5, 9.5]]},
        "ped_sim": ({"total": peds, "type": "pedscene", "max_speed": [0.5],
                     "shape": ["leg"], "size": [[0.0, 0.1, 0.1]],
                     "begin_poses_type": ["range"],
                     "begin_poses": [[0.5, 9.5, 0.5, 9.5]],
                     "target_poses_type": ["range"],
                     "target_poses": [[0.5, 9.5, 0.5, 9.5]]}
                    if peds else {"total": 0, "type": ""}),
        "global_map": {"map_file": "room_10.png", "resolution": 0.1},
        "view_map": {"resolution": 0.015, "width": 6.0, "height": 6.0},
        "range_total": 960, "max_ped": 10, "state_dim": 3,
        "sensor_mode": "fast",
    })


def main():
    from img_env_tpu.parallel.batched_env import BatchedNavEnv

    S, N, M = 16, 8, 4
    cfg = build_cfg(N, M)
    env = BatchedNavEnv(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    states, obs = env.reset(keys)
    jax.block_until_ready(obs.sensor_maps)
    print(f"rtt floor: {rtt_ms():.1f} ms | {S} scenes x {N} robots x {M} peds, fast sensors")

    @jax.jit
    def step_sum(states, actions):
        s2, o2, r, d, i = env.step_fn(states, actions)
        return o2.sensor_maps.sum() + r.sum()

    acts = jnp.zeros((S, N, 3))
    ms = fetch_ms(step_sum, lambda i: (states, acts.at[:, :, 0].add(0.001 * i)),
                  name=f"batched env step")
    if ms > 0:
        print(f"  -> {S * N / ms * 1e3:.0f} robot-steps/s aggregate")

    # PPO update throughput (rollout T steps + GAE + clipped update, 1 program)
    from img_env_tpu.models.policy import PolicyConfig, init_policy
    from img_env_tpu.train.ppo import PpoConfig, make_train_step

    T = 8
    pcfg = PolicyConfig(state_dim=int(cfg.state_dim))
    model, params = init_policy(jax.random.PRNGKey(1), pcfg)
    init_fn, train_step = make_train_step(env, model, PpoConfig(unroll=T))
    ts = init_fn(params)

    @jax.jit
    def upd_sum(ts, states, obs, key):
        ts2, s2, o2, metrics = train_step(ts, states, obs, key)
        return metrics["loss"] + metrics["reward_mean"]

    ms = fetch_ms(upd_sum, lambda i: (ts, states, obs, jax.random.PRNGKey(i)),
                  name=f"PPO update (T={T} rollout + GAE + grad)")
    if ms > 0:
        print(f"  -> {S * N * T / ms * 1e3:.0f} env-steps/s inside training")


if __name__ == "__main__":
    main()
