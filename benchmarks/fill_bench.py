"""Pallas matmul fill vs XLA gather fill at the bench200 scale (honest).

Uses varying inputs + forced scalar fetches (benchmarks/timing.py) — the
axon tunnel fakes repeated-identical-call timings.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from benchmarks.timing import fetch_ms, rtt_ms


def main():
    import bench
    bench._enable_compile_cache()   # cold-process runs otherwise recompile for minutes
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.ops import polar, raster
    from img_env_tpu.ops import pallas_fill

    cfg = bench.build()
    env = NavEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    ps = env.statics.polar
    t = env.sensor_tables
    st = env.statics
    base_pose = state.robots.pose
    print(f"rtt floor: {rtt_ms():.2f} ms")

    @jax.jit
    def layers_fn(state):
        return raster.build_layers(
            state.obs_map, st.resolution,
            state.robots.pose, jnp.asarray(st.robot_points),
            jnp.asarray(st.robot_mask),
            jnp.zeros((0, 3)), jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
            jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
            jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool))

    layers = layers_fn(state)

    @jax.jit
    def xla_sum(layers, poses, t):
        occ = polar.fill_sorted(ps, layers.packed, st.resolution, poses, t=t)
        return occ.sum()

    @jax.jit
    def pl_sum(layers, poses, t):
        occ = pallas_fill.fill_sorted_pallas(
            ps, layers.packed, st.resolution, poses, t=t)
        return occ.sum()

    def jitter(i):
        return base_pose.at[:, 2].add(0.001 * i)

    fetch_ms(xla_sum, lambda i: (layers, jitter(i), t),
             name="XLA gather fill (200 robots)")
    fetch_ms(pl_sum, lambda i: (layers, jitter(i), t),
             name="Pallas matmul fill (200 robots)")

    a = np.asarray(jax.jit(lambda l, p, t: polar.fill_sorted(
        ps, l.packed, st.resolution, p, t=t))(layers, base_pose, t))
    a = a & np.asarray(ps.gates_sorted)[None]   # pallas path returns gated occ
    b = np.asarray(jax.jit(lambda l, p, t: pallas_fill.fill_sorted_pallas(
        ps, l.packed, st.resolution, p, t=t))(layers, base_pose, t))
    print(f"mismatch fraction vs gated XLA path: {float((a != b).mean()):.2e}")


if __name__ == "__main__":
    main()
