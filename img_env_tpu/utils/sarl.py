"""SARL-style state assembly (batched port of envs/utils/sarl_helper.py:6-36).

Builds per-pedestrian rows [robot 7-tuple || ped ``ped_vec_dim``-tuple] from
the env's vector_states and ped_vector_states.  When a robot sees no peds the
reference substitutes a far-away dummy pedestrian — reproduced here.
"""

from __future__ import annotations

import jax.numpy as jnp


def concat_sarl_states(vector_state, ped_vector, robot_radius: float,
                       ped_vec_dim: int = 7, max_ped: int = 10,
                       v_pref: float = 0.6):
    """vector_state: [5] (pgx, pgy, _, v, w); ped_vector: [1+D*max_ped].

    Returns ([max_ped, 7+D] rows, [max_ped] valid mask).  Row j is the robot
    7-tuple (pgx,pgy,v,w,pgd,v_pref,r) followed by ped j's D-vector; with no
    visible peds, row 0 holds the dummy ped (10,10,.5,.5,.2,.2+r,14).
    """
    pgx, pgy, v, w = (vector_state[0], vector_state[1],
                      vector_state[-2], vector_state[-1])
    pgd = jnp.sqrt(pgx ** 2 + pgy ** 2)
    robot7 = jnp.stack([pgx, pgy, v, w, pgd, v_pref, robot_radius])

    count = ped_vector[0].astype(jnp.int32)
    peds = ped_vector[1:].reshape(max_ped, ped_vec_dim)
    dummy = jnp.asarray([10.0, 10.0, 0.5, 0.5, 0.2, 0.2 + robot_radius, 14.0])
    dummy = dummy[:ped_vec_dim]
    no_ped = count == 0
    row0 = jnp.where(no_ped, dummy, peds[0])
    peds = peds.at[0].set(row0)
    rows = jnp.concatenate(
        [jnp.broadcast_to(robot7, (max_ped, 7)), peds], axis=-1)
    valid = jnp.arange(max_ped) < jnp.maximum(count, 1)
    return rows, valid


def batched_sarl_states(vector_states, ped_vectors, robot_radius: float,
                        ped_vec_dim: int = 7, max_ped: int = 10):
    import jax

    return jax.vmap(
        lambda v, p: concat_sarl_states(
            v, p, robot_radius, ped_vec_dim, max_ped)
    )(vector_states, ped_vectors)
