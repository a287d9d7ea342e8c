"""Per-stage timing of the bench200 full-sensor control step (honest).

Every stage is timed with varying inputs and a forced scalar fetch
(benchmarks/timing.py) — plain block_until_ready loops report fake sub-ms
numbers through the axon tunnel.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from benchmarks.timing import fetch_ms, rtt_ms


def main():
    import bench
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.mpc.controller import MpcController
    from img_env_tpu.mpc.mppi import MppiConfig
    from img_env_tpu.ops import polar, raster
    from img_env_tpu.ops import pallas_fill

    cfg = bench.build()
    env = NavEnv(cfg)
    ctl = MpcController(env, MppiConfig(horizon=12, samples=128))
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    mpc_state = ctl.init_state()
    st = env.statics
    ps = st.polar
    t = env.sensor_tables
    base_pose = state.robots.pose
    print(f"rtt floor: {rtt_ms():.2f} ms")

    def jitter(i):
        return base_pose.at[:, 2].add(0.001 * i)

    @jax.jit
    def act_sum(key, state, mpc_state):
        a, m, c = ctl.act_fn(key, state, mpc_state)
        return a.sum() + c.sum()

    fetch_ms(act_sum, lambda i: (jax.random.PRNGKey(i), state, mpc_state),
             name="MPC act_fn (MPPI K=128 H=12)")

    def layers_of(state, poses):
        return raster.build_layers(
            state.obs_map, st.resolution,
            poses, jnp.asarray(st.robot_points), jnp.asarray(st.robot_mask),
            jnp.zeros((0, 3)), jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
            jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
            jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool))

    @jax.jit
    def layers_sum(state, poses):
        return layers_of(state, poses).packed.sum()

    fetch_ms(layers_sum, lambda i: (state, jitter(i)),
             name="raster.build_layers")

    layers0 = jax.jit(layers_of)(state, base_pose)

    @jax.jit
    def fill_gather_sum(layers, poses, t):
        occ = polar.fill_sorted(ps, layers.packed, st.resolution, poses, t=t)
        return occ.sum()

    fetch_ms(fill_gather_sum, lambda i: (layers0, jitter(i), t),
             name="fill: XLA gather")

    @jax.jit
    def fill_pallas_sum(layers, poses, t):
        occ = pallas_fill.fill_sorted_pallas(
            ps, layers.packed, st.resolution, poses, t=t)
        return occ.sum()

    fetch_ms(fill_pallas_sum, lambda i: (layers0, jitter(i), t),
             name="fill: Pallas matmul")

    occ0 = jax.jit(lambda l, p, t: pallas_fill.fill_sorted_pallas(
        ps, l.packed, st.resolution, p, t=t))(layers0, base_pose, t)

    @jax.jit
    def raycast_sum(occ, t, i):
        occ = occ.at[:, i].set(~occ[:, i])     # distinct input per iteration
        hits, angular = polar.raycast_batched(ps, occ, t=t)
        return hits.sum() + angular.sum()

    fetch_ms(raycast_sum, lambda i: (occ0, t, i), name="polar.raycast_batched")

    hits0, _ = jax.jit(lambda o, t: polar.raycast_batched(ps, o, t=t))(occ0, t)

    @jax.jit
    def shadow_sum(occ, hits, t, i):
        vals = polar.shadow_values_sorted(ps, occ, hits + 0.0001 * i, t=t)
        return vals.sum()

    fetch_ms(shadow_sum, lambda i: (occ0, hits0, t, i),
             name="polar.shadow_values_sorted (legacy approx)")

    if env.paint_ks is not None:
        from img_env_tpu.ops import painter as painter_mod
        from img_env_tpu.ops import pallas_paint

        @jax.jit
        def paint_sum(occ, t, i):
            occ = occ.at[:, i].set(~occ[:, i])
            _, _, aux = polar.raycast_batched(ps, occ, t=t, return_aux=True)
            s_hit, s_tail = painter_mod.hit_steps(st.painter, *aux,
                                                  t=t.painter)
            vals = pallas_paint.paint_sorted_pallas(
                env.paint_pst, env.paint_ks, s_hit, s_tail,
                tables=t.painter.kernel)
            return vals.sum()

        fetch_ms(paint_sum, lambda i: (occ0, t, i),
                 name="exact painter (raycast aux + Pallas kernel)")

    vals0 = jax.jit(lambda o, h, t: polar.shadow_values_sorted(
        ps, o, h, t=t))(occ0, hits0, t)

    @jax.jit
    def stamp_sum(vals, i):
        v = polar.stamp_self_sorted(
            ps, vals + 0.0001 * i, jnp.asarray(st.own_slots),
            jnp.asarray(st.own_slots_ok))
        return v.sum()

    fetch_ms(stamp_sum, lambda i: (vals0, i), name="polar.stamp_self_sorted")

    @jax.jit
    def resize_sum(vals, t, i):
        sm = polar.sensor_maps_from_sorted(
            ps, vals + 0.0001 * i, tuple(cfg.image_size), t=t)
        return sm.sum()

    fetch_ms(resize_sum, lambda i: (vals0, t, i),
             name="polar.sensor_maps_from_sorted")

    @jax.jit
    def observe_sum(state, poses, tables):
        s2 = state._replace(robots=state.robots._replace(pose=poses))
        s3, o2 = env._observe(s2, tables)
        return o2.sensor_maps.sum() + o2.lasers.sum()

    fetch_ms(observe_sum, lambda i: (state, jitter(i), t),
             name="full _observe")

    @jax.jit
    def step_sum(state, actions, tables):
        s2, o2, r, d, info = env.step_fn(state, actions, tables)
        return o2.sensor_maps.sum() + o2.lasers.sum() + r.sum()

    acts = jnp.zeros((cfg.robot.total, 3))
    fetch_ms(step_sum, lambda i: (state, acts.at[:, 0].add(0.001 * i), t),
             name="full env.step_fn")

    @jax.jit
    def control_sum(key, state, mpc_state, tables):
        k_plan, k_next = jax.random.split(key)
        actions, mpc_state, costs = ctl.act_fn(k_plan, state, mpc_state)
        state, o2, r, d, info = env.step_fn(state, actions, tables)
        return o2.sensor_maps.sum() + o2.lasers.sum() + costs.sum()

    fetch_ms(control_sum,
             lambda i: (jax.random.PRNGKey(i), state, mpc_state, t),
             name="full control step (act + step)")


if __name__ == "__main__":
    main()
