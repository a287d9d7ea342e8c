"""MPC controller bound to a NavEnv: state -> actions, fully jitted.

``MpcController`` precomputes the static-map EDT once on the host (the map is
fixed for an env, grid_map.cpp:28-38) and builds the per-episode ``WorldCost``
from the live ``WorldState`` (episode obstacle AABBs are already in the state,
env/sampler.py obstacle_corners).  ``act`` runs K-sample MPPI (or CEM) for
every robot inside one XLA program; batch over scenes with vmap outside.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.core.state import WorldState
from img_env_tpu.env.nav_env import NavEnv
from img_env_tpu.mpc.cost import CostWeights, WorldCost
from img_env_tpu.mpc.edt import edt2d
from img_env_tpu.mpc.ilqr import IlqrConfig, batched_ilqr
from img_env_tpu.mpc.mppi import (
    MppiConfig,
    PlannerState,
    batched_mppi,
    cem_plan,
    mppi_plan,
)

OCCUPIED_THRESH = 250  # grid value < 250 is occupied (agent.cpp:394-401)


class MpcState(NamedTuple):
    nominal: jnp.ndarray   # [N,H,2]


class MpcController:
    def __init__(
        self,
        env: NavEnv,
        cfg: Optional[MppiConfig] = None,
        weights: Optional[CostWeights] = None,
        method: str = "mppi",
        ped_prediction: str = "cv",   # 'cv' | 'orca' | 'sfm' head
    ):
        self.env = env
        self.ped_prediction = ped_prediction
        ranges = env.cfg.continuous_actions
        self.cfg = cfg or MppiConfig(
            v_range=tuple(ranges[0]), w_range=tuple(ranges[1]))
        self.weights = weights or CostWeights(
            ped_safety=float(env.cfg.ped_safety_space),
        )
        self.method = method
        st = env.statics
        occupied = np.asarray(st.static_map) < OCCUPIED_THRESH
        self.static_edt = jnp.asarray(edt2d(occupied, st.resolution), jnp.float32)
        self.robot_radius = float(np.max(st.robot_radius)) if st.robot_radius.size else 0.17
        self._act = jax.jit(self.act_fn)

    def init_state(self) -> MpcState:
        n = self.env.cfg.robot.total
        return MpcState(nominal=jnp.zeros((n, self.cfg.horizon, 2)))

    def world_cost(self, state: WorldState) -> WorldCost:
        """Episode clearance field from ``WorldState.obs_edt`` (computed at
        reset over static map + sampled obstacles, env/nav_env.py), so no
        per-sample analytic obstacle terms are needed — one EDT lookup
        covers all O obstacles.  Falls back to the host static EDT + AABB
        terms when a caller passes a state without the episode EDT."""
        if state.obs_edt.shape[0] > 1:
            return WorldCost(
                edt=state.obs_edt,
                resolution=self.env.statics.resolution,
                obs_aabb=jnp.zeros((0, 4)),
                obs_valid=jnp.zeros((0,), bool),
                robot_radius=self.robot_radius,
            )
        o = state.obstacles.aabb.shape[0]
        return WorldCost(
            edt=self.static_edt,
            resolution=self.env.statics.resolution,
            obs_aabb=state.obstacles.aabb,
            obs_valid=jnp.ones((o,), bool),
            robot_radius=self.robot_radius,
        )

    def act_fn(self, key, state: WorldState, mpc_state: MpcState):
        """Plan for all robots. Returns (actions [N,3], new MpcState, costs [N])."""
        env = self.env
        n = env.cfg.robot.total
        m = env.cfg.ped_sim.total
        wc = self.world_cost(state)
        ped_pos = state.peds.pos if m else jnp.zeros((0, 2))
        ped_vel = state.peds.vel if m else jnp.zeros((0, 2))
        ped_r = jnp.asarray(env.statics.ped_r) if m else jnp.zeros((0,))

        # one ped-trajectory prediction per solve, shared by all rollouts
        from img_env_tpu.mpc.prediction import predict_peds

        ped_vmax = (jnp.asarray(env.statics.ped_max_speed)
                    if m else jnp.zeros((0,)))
        ped_traj = predict_peds(
            self.ped_prediction, ped_pos, ped_vel, ped_vmax,
            self.cfg.horizon, float(env.cfg.control_hz),
            orca_cfg=env.statics.orca_cfg,
            segments=state.obstacles.segs,   # episode split segments (or None)
        )

        # other robots join the avoidance set as constant-velocity tracks
        # (each planner's own column is self-masked in batched_mppi)
        dt = float(env.cfg.control_hz)
        ts = (jnp.arange(1, self.cfg.horizon + 1, dtype=jnp.float32)
              * dt)[:, None, None]
        robot_traj = state.robots.pose[None, :, :2] + \
            state.robots.vel_world[None] * ts                   # [H,N,2]
        robot_r = jnp.asarray(env.statics.robot_radius)

        if self.method == "ilqr":
            icfg = IlqrConfig(
                horizon=self.cfg.horizon,
                v_range=self.cfg.v_range, w_range=self.cfg.w_range)
            us, xs, costs = batched_ilqr(
                state.robots.pose, state.robots.goal, mpc_state.nominal,
                wc, ped_traj, ped_r, icfg, self.weights,
                dt, robot_traj=robot_traj, robot_r=robot_r)
            acts = us[:, 0]
            nominal = jnp.concatenate([us[:, 1:], us[:, -1:]], axis=1)
        else:
            keys = jax.random.split(key, n)
            acts, nominal, costs = batched_mppi(
                keys, mpc_state.nominal,
                state.robots.pose, state.robots.vw_last0, state.robots.vw_last1,
                state.robots.goal, wc,
                env.statics.limiter_v, env.statics.limiter_w,
                ped_traj, ped_r, self.cfg, self.weights,
                dt, env.cfg.robot_type == "omni",
                robot_traj=robot_traj, robot_r=robot_r,
            )
        actions = jnp.concatenate([acts, jnp.zeros((n, 1))], axis=-1)
        return actions, MpcState(nominal=nominal), costs

    def act(self, key, state: WorldState, mpc_state: MpcState):
        return self._act(key, state, mpc_state)
