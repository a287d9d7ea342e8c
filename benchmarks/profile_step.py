"""Per-stage timing of the bench200 control loop on the real chip.

Times each stage of the hot path separately (env step, its sub-stages, the
MPPI solve) so optimization effort goes where the milliseconds are.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2, name=""):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {ms:8.2f} ms")
    return ms


def main():
    import bench

    cfg = bench.build()
    from img_env_tpu.env.nav_env import NavEnv
    from img_env_tpu.mpc.controller import MpcController
    from img_env_tpu.mpc.mppi import MppiConfig
    from img_env_tpu.ops import raster
    from img_env_tpu.ops.view import render_robot_view
    from img_env_tpu.ops.resize import sensor_map_from_view

    env = NavEnv(cfg)
    ctl = MpcController(env, MppiConfig(horizon=12, samples=128))
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    mstate = ctl.init_state()
    actions = jnp.tile(jnp.asarray([[0.3, 0.1, 0.0]]), (cfg.robot.total, 1))
    tables = env.sensor_tables

    print(f"config: {cfg.robot.total} robots, {cfg.object.total} obstacles, "
          f"{cfg.range_total} beams, view {cfg.view_pixels}")

    timeit(jax.jit(env.step_fn), state, actions, tables, name="full env step")

    # --- polar stages ----------------------------------------------------
    from img_env_tpu.ops import polar as polar_mod

    ps = env.statics.polar

    @jax.jit
    def stage_polar_fill(state, layers, tables):
        own_maps, own_orig = raster.own_local_maps(
            layers.robot_cells, layers.robot_cells_valid)
        return polar_mod.fill_sorted(
            ps, layers.packed, env.statics.resolution, state.robots.pose,
            own_maps, own_orig, t=tables)

    @jax.jit
    def stage_polar_ray(occ, tables):
        return polar_mod.raycast_batched(ps, occ, t=tables)

    @jax.jit
    def stage_polar_shadow(occ, hits, tables):
        return polar_mod.shadow_values_sorted(ps, occ, hits, t=tables)

    @jax.jit
    def stage_polar_resize(vals, tables):
        return polar_mod.sensor_maps_from_sorted(ps, vals, (48, 48), t=tables)
    timeit(jax.jit(ctl.act_fn), key, state, mstate, name="MPPI solve (K=128,H=12) x200")

    st = env.statics

    @jax.jit
    def stage_layers(state):
        n = cfg.robot.total
        return raster.build_layers(
            state.obs_map, st.resolution,
            state.robots.pose, jnp.asarray(st.robot_points),
            jnp.asarray(st.robot_mask),
            jnp.zeros((0, 3)), jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
            jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
            jnp.zeros((0, 1, 2)), jnp.zeros((0, 1), bool),
        )

    layers = stage_layers(state)
    jax.block_until_ready(layers)
    timeit(stage_layers, state, name="  raster layers (scatter)")

    occ = stage_polar_fill(state, layers, tables)
    jax.block_until_ready(occ)
    timeit(stage_polar_fill, state, layers, tables, name="  polar fill (1 gather/robot)")
    hits, _ = stage_polar_ray(occ, tables)
    jax.block_until_ready(hits)
    timeit(stage_polar_ray, occ, tables, name="  polar raycast (matmuls)")
    vals = stage_polar_shadow(occ, hits, tables)
    jax.block_until_ready(vals)
    timeit(stage_polar_shadow, occ, hits, tables, name="  polar shadow (one-hot matmul)")
    timeit(stage_polar_resize, vals, tables, name="  polar sparse resize")

    @jax.jit
    def stage_views(state, layers):
        own_maps, own_orig = raster.own_local_maps(
            layers.robot_cells, layers.robot_cells_valid)
        render = jax.vmap(
            lambda pose, om, oo, vc, vm: render_robot_view(
                layers, st.resolution, pose, om, oo, vc, vm,
                st.view_statics, st.view_params))
        return render(state.robots.pose, own_maps, own_orig,
                      jnp.asarray(st.own_view_cells),
                      jnp.asarray(st.own_view_valid))

    views = stage_views(state, layers)
    jax.block_until_ready(views)
    timeit(stage_views, state, layers, name="  view render + raycast (N robots)")

    @jax.jit
    def stage_resize(views0):
        return sensor_map_from_view(views0, tuple(cfg.image_size))

    timeit(stage_resize, views[0], name="  48x48 cubic resize")

    @jax.jit
    def stage_collision(state, layers):
        return raster.collision_codes(
            layers, state.robots.collision, state.robots.arrive)

    timeit(stage_collision, state, layers, name="  collision codes")

    from img_env_tpu.dynamics.kinematics import batched_robot_cmd

    @jax.jit
    def stage_kin(state):
        return batched_robot_cmd(
            state.robots.pose, state.robots.goal,
            state.robots.vw_last0, state.robots.vw_last1,
            state.robots.vel_world,
            actions[:, 0], actions[:, 1], actions[:, 2],
            jnp.ones((cfg.robot.total,), bool),
            st.limiter_v, st.limiter_w,
            float(cfg.control_hz), cfg.n_substeps, cfg.robot_type)

    timeit(stage_kin, state, name="  kinematics (substep scan)")


if __name__ == "__main__":
    main()
