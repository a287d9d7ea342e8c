"""Per-stage timing + roofline of the bench200 full-sensor control step.

Every stage is timed with varying inputs and a forced scalar fetch
(benchmarks/timing.py) — plain block_until_ready loops report fake sub-ms
numbers through the axon tunnel.

Each stage also reports a ROOFLINE row: XLA's own cost analysis (flops +
bytes accessed) for the compiled stage, the achieved GB/s and TFLOP/s at
the measured time, and the bound-setting "light" time
``max(bytes/HBM_peak, flops/MXU_peak)`` — the distance from speed of
light on this chip.  Pallas kernels are invisible to XLA's counter, so
their table/stream traffic is added from the kernel statics (the
``+pallas`` bytes column).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from benchmarks.timing import fetch_ms, rtt_ms
from benchmarks.roofline import PEAK_BW_GBS, PEAK_TFLOPS, xla_cost


def prof(name, jitfn, make_args, extra_bytes=0.0, extra_flops=0.0):
    """fetch_ms + a roofline row.  extra_* add Pallas-side traffic that
    XLA's counter cannot see (kernel tables / streamed operands)."""
    dev_ms = fetch_ms(jitfn, make_args, name=name)
    flops, bts = xla_cost(jitfn, make_args(0))
    flops += extra_flops
    bts += extra_bytes
    if dev_ms > 0 and (flops or bts):
        gbs = bts / dev_ms / 1e6
        tfl = flops / dev_ms / 1e9
        light_ms = max(bts / PEAK_BW_GBS / 1e6, flops / PEAK_TFLOPS / 1e9)
        bound = ("BW" if bts / PEAK_BW_GBS / 1e6 >= flops / PEAK_TFLOPS / 1e9
                 else "MXU")
        print(f"{'':8s}roofline: {bts/1e6:9.1f} MB {flops/1e9:9.2f} GF -> "
              f"{gbs:7.1f} GB/s ({100*gbs/PEAK_BW_GBS:5.1f}%BW) "
              f"{tfl:7.2f} TF/s ({100*tfl/PEAK_TFLOPS:5.1f}%MXU) "
              f"light {light_ms:6.2f} ms [{bound}-bound, "
              f"{dev_ms/max(light_ms,1e-9):5.1f}x off]")
    return dev_ms


def main():
    import bench
    bench._enable_compile_cache()   # cold-process runs otherwise recompile for minutes
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
    n_rob = int(base_pose.shape[0])
    print(f"rtt floor: {rtt_ms():.2f} ms")
    print(f"rooflines vs v5e peaks: {PEAK_BW_GBS:.0f} GB/s HBM, "
          f"{PEAK_TFLOPS:.0f} TFLOP/s MXU (XLA cost model + Pallas-side "
          f"stream estimates; VPU-bound stages look artificially far from "
          f"'light')")

    # Pallas-side traffic XLA cannot count — single source of truth in
    # benchmarks/roofline.py (shared with bench.py's headline field)
    from benchmarks.roofline import pallas_traffic_components

    ((fill_extra_bytes, fill_extra_flops),
     (paint_extra_bytes, paint_extra_flops)) = pallas_traffic_components(
        env, state)

    def jitter(i):
        return base_pose.at[:, 2].add(0.001 * i)

    @jax.jit
    def act_sum(key, state, mpc_state):
        a, m, c = ctl.act_fn(key, state, mpc_state)
        return a.sum() + c.sum()

    prof("MPC act_fn (MPPI K=128 H=12)", act_sum,
         lambda i: (jax.random.PRNGKey(i), state, mpc_state))

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

    prof("raster.build_layers", layers_sum, lambda i: (state, jitter(i)))

    layers0 = jax.jit(layers_of)(state, base_pose)

    @jax.jit
    def fill_gather_sum(layers, poses, t):
        occ = polar.fill_sorted(ps, layers.packed, st.resolution, poses, t=t)
        return occ.sum()

    prof("fill: XLA gather", fill_gather_sum,
         lambda i: (layers0, jitter(i), t))

    @jax.jit
    def fill_pallas_sum(layers, poses, t):
        occ = pallas_fill.fill_sorted_pallas(
            ps, layers.packed, st.resolution, poses, t=t)
        return occ.sum()

    prof("fill: Pallas matmul", fill_pallas_sum,
         lambda i: (layers0, jitter(i), t),
         extra_bytes=fill_extra_bytes, extra_flops=fill_extra_flops)

    occ0 = jax.jit(lambda l, p, t: pallas_fill.fill_sorted_pallas(
        ps, l.packed, st.resolution, p, t=t))(layers0, base_pose, t)

    @jax.jit
    def raycast_sum(occ, t, i):
        occ = occ.at[:, i].set(~occ[:, i])     # distinct input per iteration
        hits, angular = polar.raycast_batched(ps, occ, t=t)
        return hits.sum() + angular.sum()

    prof("polar.raycast_batched", raycast_sum, lambda i: (occ0, t, i))

    hits0, _ = jax.jit(lambda o, t: polar.raycast_batched(ps, o, t=t))(occ0, t)

    @jax.jit
    def shadow_sum(occ, hits, t, i):
        vals = polar.shadow_values_sorted(ps, occ, hits + 0.0001 * i, t=t)
        return vals.sum()

    prof("polar.shadow_values_sorted (legacy approx)", shadow_sum,
         lambda i: (occ0, hits0, t, i))

    if env.paint_ks is not None or env.paint_kst is not None:
        from img_env_tpu.ops import painter as painter_mod
        from img_env_tpu.ops import pallas_paint, pallas_paint_t

        def paint_active(s_hit, s_tail):
            if env.paint_kst is not None:
                return pallas_paint_t.paint_sorted_pallas_t(
                    env.paint_kst, s_hit, s_tail,
                    tables=t.painter.kernel_t)
            return pallas_paint.paint_sorted_pallas(
                env.paint_pst, env.paint_ks, s_hit, s_tail,
                tables=t.painter.kernel)

        @jax.jit
        def paint_sum(occ, t, i):
            occ = occ.at[:, i].set(~occ[:, i])
            _, _, aux = polar.raycast_batched(ps, occ, t=t, return_aux=True)
            s_hit, s_tail = painter_mod.hit_steps(st.painter, *aux,
                                                  t=t.painter)
            return paint_active(s_hit, s_tail).sum()

        kind = "gen-2 transposed" if env.paint_kst is not None else "gen-1"
        prof(f"exact painter (raycast aux + {kind} kernel)", paint_sum,
             lambda i: (occ0, t, i),
             extra_bytes=paint_extra_bytes, extra_flops=paint_extra_flops)

        # A/B: time the OTHER painter kernel from the same thresholds
        _, _, aux0 = jax.jit(lambda o: polar.raycast_batched(
            ps, o, t=t, return_aux=True))(occ0)
        sh0, st0_ = jax.jit(lambda a: painter_mod.hit_steps(
            st.painter, *a, t=t.painter))(aux0)
        if env.paint_kst is not None:
            ks_b = pallas_paint.PaintKernelStatics.build(env.paint_pst)
            tb_b = pallas_paint.make_paint_tables(ks_b)

            @jax.jit
            def paint_b_sum(sh, stl, i):
                return pallas_paint.paint_sorted_pallas(
                    env.paint_pst, ks_b, sh + 0 * i, stl,
                    tables=tb_b).sum()

            fetch_ms(paint_b_sum, lambda i: (sh0, st0_, i),
                     name="  (A/B) gen-1 block kernel, decode only")
        else:
            kst_b = pallas_paint_t.PaintTStatics.build(env.paint_pst)
            tt_b = pallas_paint_t.make_paint_t_tables(kst_b)

            @jax.jit
            def paint_t_sum(sh, stl, i):
                return pallas_paint_t.paint_sorted_pallas_t(
                    kst_b, sh + 0 * i, stl, tables=tt_b).sum()

            fetch_ms(paint_t_sum, lambda i: (sh0, st0_, i),
                     name="  (A/B) gen-2 transposed kernel, decode only")

    vals0 = jax.jit(lambda o, h, t: polar.shadow_values_sorted(
        ps, o, h, t=t))(occ0, hits0, t)

    @jax.jit
    def stamp_sum(vals, i):
        v = polar.stamp_self_sorted(
            ps, vals + 0.0001 * i, jnp.asarray(st.own_slots),
            jnp.asarray(st.own_slots_ok))
        return v.sum()

    prof("polar.stamp_self_sorted", stamp_sum, lambda i: (vals0, i))

    @jax.jit
    def resize_sum(vals, t, i):
        sm = polar.sensor_maps_from_sorted(
            ps, vals + 0.0001 * i, tuple(cfg.image_size), t=t)
        return sm.sum()

    prof("polar.sensor_maps_from_sorted", resize_sum,
         lambda i: (vals0, t, i))

    @jax.jit
    def observe_sum(state, poses, tables):
        s2 = state._replace(robots=state.robots._replace(pose=poses))
        s3, o2 = env._observe(s2, tables)
        return o2.sensor_maps.sum() + o2.lasers.sum()

    prof("full _observe", observe_sum, lambda i: (state, jitter(i), t),
         extra_bytes=fill_extra_bytes + paint_extra_bytes,
         extra_flops=fill_extra_flops + paint_extra_flops)

    @jax.jit
    def step_sum(state, actions, tables):
        s2, o2, r, d, info = env.step_fn(state, actions, tables)
        return o2.sensor_maps.sum() + o2.lasers.sum() + r.sum()

    acts = jnp.zeros((cfg.robot.total, 3))
    prof("full env.step_fn", step_sum,
         lambda i: (state, acts.at[:, 0].add(0.001 * i), t),
         extra_bytes=fill_extra_bytes + paint_extra_bytes,
         extra_flops=fill_extra_flops + paint_extra_flops)

    @jax.jit
    def control_sum(key, state, mpc_state, tables):
        k_plan, k_next = jax.random.split(key)
        actions, mpc_state, costs = ctl.act_fn(k_plan, state, mpc_state)
        state, o2, r, d, info = env.step_fn(state, actions, tables)
        return o2.sensor_maps.sum() + o2.lasers.sum() + costs.sum()

    prof("full control step (act + step)", control_sum,
         lambda i: (jax.random.PRNGKey(i), state, mpc_state, t),
         extra_bytes=fill_extra_bytes + paint_extra_bytes,
         extra_flops=fill_extra_flops + paint_extra_flops)


if __name__ == "__main__":
    main()
