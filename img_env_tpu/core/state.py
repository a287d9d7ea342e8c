"""World-state pytrees.

One ``WorldState`` holds a *single scene* (N robots, M peds, O obstacles);
batching over scenes is done with ``vmap``/``shard_map`` outside.  All leaves
are fixed-shape arrays so the whole step compiles once.

The fields mirror the mutable state of the reference C++ core (img_env.h:62-151,
agent.h:20-151) re-expressed functionally.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class RobotState(NamedTuple):
    """Per-robot dynamic state. Leading dim N."""

    pose: jnp.ndarray          # [N,3] x, y, yaw (world)
    goal: jnp.ndarray          # [N,2] goal position (world)
    goal_yaw: jnp.ndarray      # [N]   yaw recorded at set_goal (agent.cpp:148)
    vw_last0: jnp.ndarray      # [N,2] previous limited command (v, w)
    vw_last1: jnp.ndarray      # [N,2] command before that
    vel_world: jnp.ndarray     # [N,2] world-frame (vx, vy) from last substep
    collision: jnp.ndarray     # [N] int32 collision code 0/1/2/3 (latched)
    arrive: jnp.ndarray        # [N] bool (latched)
    beep: jnp.ndarray          # [N] int32 0/1 — beeped this step


class PedState(NamedTuple):
    """Per-pedestrian dynamic state. Leading dim M."""

    pos: jnp.ndarray           # [M,2] world position
    yaw: jnp.ndarray           # [M]
    prev_pos: jnp.ndarray      # [M,2] position before the last crowd step
    vel: jnp.ndarray           # [M,2] world-frame velocity
    goal: jnp.ndarray          # [M,2] sampled target (pedsim's first
                               #   waypoint, pedscene.h:41-42)
    # --- img_env-level waypoint cycling (agent.cpp:823-843) ---
    traj: jnp.ndarray          # [M,W,2] waypoints (goal[, start] or the
                               #   scripted Agent.trajectory list) padded
    traj_len: jnp.ndarray      # [M] int32 number of valid waypoints
    traj_idx: jnp.ndarray      # [M] int32 cur_traj_index_
    # --- leg gait (agent.cpp:696-735) ---
    gait_state: jnp.ndarray    # [M] int32 in [0,7)
    gait_residual: jnp.ndarray # [M] remaining_dist_
    leg_offset: jnp.ndarray    # [M,2,2] (left,right) leg centers in base frame
    # --- SFM internals (pedsim Tagent) ---
    sfm_wp_idx: jnp.ndarray    # [M] int32 index of current pedsim destination
    sfm_has_dest: jnp.ndarray  # [M] bool destination != NULL
    sfm_lastdest: jnp.ndarray  # [M] int32 lastdestination idx (-1 if none)
    # --- dataset replay (ETH/UCY; img_env.cpp:361-386) ---
    dataset_traj: jnp.ndarray  # [M,T,2] replayed positions ([M,1,2] when unused)
    dataset_vel: jnp.ndarray   # [M,T,2] replayed velocities
    dataset_len: jnp.ndarray   # [M] int32 valid length per ped


class CrowdAuxState(NamedTuple):
    """Kinematic robot mirrors inside the crowd solver.

    When ``relation_ped_robo == 1`` robots participate in the crowd model as
    extra agents whose position/velocity are overwritten every step
    (rvoscene.h:47-51, pedscene.h:53-56).  The SFM variant keeps an internal
    velocity that integrates forces (ped_agent.cpp:564) — stored here.
    """

    robot_vel: jnp.ndarray     # [N,2] internal crowd-model velocity of robots


class ObstacleState(NamedTuple):
    """Per-episode randomized obstacles. Leading dim O."""

    pose: jnp.ndarray          # [O,3]
    size: jnp.ndarray          # [O,4] circle: (cx,cy,r,0); rect: (x0,x1,y0,y1)
    is_circle: jnp.ndarray     # [O] bool
    aabb: jnp.ndarray          # [O,4] world-frame corners (pax,pay,pbx,pby)
    # ORCA boundary segments after RVO2's kd-tree splitting
    # (crowd/obstacle_split.py; KdTree.cpp:131-257), built once per episode
    # for the rvoscene/ervoscene crowd models.  None for other scene types.
    segs: Optional[NamedTuple] = None


class WorldState(NamedTuple):
    robots: RobotState
    peds: PedState
    crowd_aux: CrowdAuxState
    obstacles: ObstacleState
    obs_map: jnp.ndarray       # [H,W] uint8 static+obstacle composed occupancy
    obs_edt: jnp.ndarray       # [H,W] float32 Euclidean distance to occupied [m]
    step: jnp.ndarray          # [] int32 sim step index within the episode
    rng: jnp.ndarray           # PRNG key threaded through stochastic pieces
    prev_goal_dist: jnp.ndarray  # [N] distance-to-goal after previous obs
    has_prev_dist: jnp.ndarray   # [] bool — step_ds is 0 on the first obs


class Observation(NamedTuple):
    """Batched per-robot observation — mirrors ImageState (envs/state/state.py)."""

    vector_states: jnp.ndarray      # [N,state_dim]
    sensor_maps: jnp.ndarray        # [N,48,48] float (f16-scaled /255)
    is_collisions: jnp.ndarray      # [N] int32
    is_arrives: jnp.ndarray         # [N] int32
    lasers: jnp.ndarray             # [N,range_total]
    ped_vector_states: jnp.ndarray  # [N,1+ped_vec_dim*max_ped]
    ped_maps: jnp.ndarray           # [N,3,48,48]
    step_ds: jnp.ndarray            # [N]
    ped_min_dists: jnp.ndarray      # [N]
    # AgentState extras the reference ships per robot (img_env.cpp:566-571):
    # the 72-bin min-pooled angular map and per-beam hit points in the base
    # frame (hit * cos/sin of the beam angle, agent.cpp:434-436).
    angular_maps: jnp.ndarray = None   # [N,72]
    hit_points: jnp.ndarray = None     # [N,range_total,2]
