"""Geodesic goal-field correctness (mpc/cost.geodesic_field).

The field is the MPC's global guidance on maze-like worlds (BARN): its
value at a cell must equal the shortest 8-connected path length through
the robot-inflated free space to the goal cell — verified against a
reference Dijkstra — and the bilinear lookup must interpolate it.
"""

import heapq

import jax.numpy as jnp
import numpy as np

from img_env_tpu.mpc.cost import WorldCost, geodesic_field, goal_distance

RES = 0.1


def _dijkstra(free, goal, res):
    h, w = free.shape
    # match geodesic_field's saturation: (2*(h+w)+2) * res * sqrt2
    big = (2 * (h + w) + 2.0) * res * 1.4142135
    dist = np.full((h, w), big)
    dist[goal] = 0.0
    pq = [(0.0, goal)]
    while pq:
        d, (r, c) = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == dc == 0:
                    continue
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w and free[rr, cc]:
                    nd = d + res * (1.4142135 if dr and dc else 1.0)
                    if nd < dist[rr, cc]:
                        dist[rr, cc] = nd
                        heapq.heappush(pq, (nd, (rr, cc)))
    return dist


def _u_map():
    """U-shaped wall: the Euclidean goal distance pulls into the pocket;
    the geodesic routes around."""
    occ = np.zeros((20, 20), bool)
    occ[5:15, 8] = True
    occ[5, 8:14] = True
    occ[14, 8:14] = True
    return occ


def test_field_matches_dijkstra():
    occ = _u_map()
    # trivial EDT: free cells get a large clearance, occupied 0, so the
    # inflation mask is exactly ~occ
    edt = np.where(occ, 0.0, 10.0)
    goal = np.array([10 * RES, 2 * RES])          # inside the pocket side
    f = np.asarray(geodesic_field(jnp.asarray(edt), RES, jnp.asarray(goal),
                                  robot_radius=0.01))
    ref = _dijkstra(~occ, (10, 2), RES)
    # goal cell is forced to 0 even in the reference
    np.testing.assert_allclose(f, ref, atol=1e-4)


def test_field_routes_around_pocket():
    occ = _u_map()
    edt = np.where(occ, 0.0, 10.0)
    goal = np.array([10 * RES, 2 * RES])
    f = np.asarray(geodesic_field(jnp.asarray(edt), RES, jnp.asarray(goal),
                                  robot_radius=0.01))
    inside = f[10, 10]     # inside the U pocket, Euclid-close to the goal
    outside = f[2, 10]     # outside, Euclid-farther
    assert inside > outside, (
        "pocket cell must be geodesically FARTHER than the open cell "
        f"({inside:.2f} <= {outside:.2f}) — that's the whole point")
    euclid_inside = np.hypot((10 - 10) * RES, (10 - 2) * RES)
    assert inside > euclid_inside + 0.5


def test_goal_distance_lookup_and_fallback():
    occ = np.zeros((16, 16), bool)
    edt = np.where(occ, 0.0, 10.0)
    goal = jnp.asarray([0.8, 0.8])
    f = geodesic_field(jnp.asarray(edt), RES, goal, robot_radius=0.01)
    wc = WorldCost(edt=jnp.asarray(edt), resolution=RES,
                   obs_aabb=jnp.zeros((0, 4)), obs_valid=jnp.zeros((0,), bool),
                   robot_radius=0.01, goal_field=f)
    xy = jnp.asarray([[0.3, 0.8], [0.8, 0.3]])
    d = np.asarray(goal_distance(wc, xy, goal))
    # empty map: geodesic == straight-line (both axis-aligned here)
    np.testing.assert_allclose(d, [0.5, 0.5], atol=0.02)
    # without a field: exact Euclidean
    wc0 = wc._replace(goal_field=None)
    d0 = np.asarray(goal_distance(wc0, xy, goal))
    np.testing.assert_allclose(d0, [0.5, 0.5], atol=1e-6)


def test_pooled_edt_patch_bitmatch():
    """pool-then-slice (pooled_edt path) == slice-then-pool, bit for bit —
    the corners are pool-aligned by construction."""
    import jax

    from img_env_tpu.mpc.cost import local_edt_patch, pooled_edt

    rng = np.random.default_rng(3)
    edt = jnp.asarray(rng.random((200, 212)).astype(np.float32))
    wc = WorldCost(edt=edt, resolution=RES, obs_aabb=jnp.zeros((0, 4)),
                   obs_valid=jnp.zeros((0,), bool), robot_radius=0.1)
    pool, ps = 4, 64
    ep = pooled_edt(edt, pool)
    for xy in ([1.0, 1.0], [0.05, 0.05], [19.9, 21.1], [10.0, 0.2]):
        pa, ca = jax.jit(lambda p: local_edt_patch(wc, p, ps, pool))(
            jnp.asarray(xy))
        pb, cb = jax.jit(lambda p: local_edt_patch(
            wc, p, ps, pool, edt_pooled=ep))(jnp.asarray(xy))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
