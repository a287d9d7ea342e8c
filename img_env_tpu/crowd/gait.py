"""Pedestrian two-leg gait model (PedAgent, agent.cpp:653-735).

The 7-phase cycle advances with distance walked; phases place the legs at
base-frame offsets of 0, ±step_len/2, ±step_len along x.  Note phase 7 is
unreachable (state % 7), so the reference's ``state==5 || state==7`` branch
effectively triggers only at 5 — reproduced by the lookup table below.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from img_env_tpu.constants import GAIT_PHASES, GAIT_STEP_LEN

# x-offset multipliers (in units of step_len) for (left, right) per phase.
# phases 0,4: configured rest offsets; 1,3: right leads by half; 2: full;
# 5: left leads by half; 6: left leads by full.
_LEFT_MULT = np.array([0.0, -0.5, -1.0, -0.5, 0.0, 0.5, 1.0], np.float32)
_RIGHT_MULT = np.array([0.0, 0.5, 1.0, 0.5, 0.0, -0.5, -1.0], np.float32)
_REST = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0], np.float32)  # use rest offsets


def update_gait(
    gait_state, gait_residual, move_dist, rest_left_xy, rest_right_xy
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance the gait cycle (PedAgent::update_bbox, agent.cpp:696-735).

    move_dist: [M] distance moved since last step.
    rest_left_xy/rest_right_xy: [M,2] configured leg offsets (sizes[0:2], [3:5]).
    Returns (new_state [M], new_residual [M], leg_offsets [M,2,2]).
    """
    total = move_dist + gait_residual
    new_state = (total / GAIT_STEP_LEN).astype(jnp.int32) + gait_state
    new_residual = total - (new_state - gait_state).astype(total.dtype) * GAIT_STEP_LEN
    new_state = new_state % GAIT_PHASES

    lm = jnp.asarray(_LEFT_MULT)[new_state] * GAIT_STEP_LEN
    rm = jnp.asarray(_RIGHT_MULT)[new_state] * GAIT_STEP_LEN
    rest = jnp.asarray(_REST)[new_state]

    # Phases 0/4 restore the configured (x, y) rest offsets; the stride phases
    # overwrite only x and keep the previous y — which after any 0/4 visit is
    # the configured y (the reference never changes leg.y outside 0/4).
    left = jnp.stack(
        [jnp.where(rest > 0, rest_left_xy[:, 0], lm), rest_left_xy[:, 1]], -1
    )
    right = jnp.stack(
        [jnp.where(rest > 0, rest_right_xy[:, 0], rm), rest_right_xy[:, 1]], -1
    )
    legs = jnp.stack([left, right], axis=1)  # [M,2,2]
    return new_state, new_residual, legs
