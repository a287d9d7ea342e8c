"""RVO2 obstacle kd-tree segment splitting as a fixed-shape JAX worklist.

The reference's obstacle kd-tree build (ervo_ros/src/KdTree.cpp:131-257)
SPLITS any boundary segment that straddles the supporting line of the
partition segment chosen at each tree level, inserting collinear convex
pseudo-vertices.  Those pseudo-vertices change the ORCA constraint geometry
near adjacent/overlapping rectangles (a convex vertex gets cutoff-circle
legs where an interior point would produce a straight line), so serving
unsplit segments is NOT equivalent — measured divergence up to ~0.5 m/s in
single solves on adversarial layouts.

The C++ algorithm is a pointer-chasing recursion over dynamically sized
subsets.  Here it becomes a ``lax.while_loop`` over an explicit stack of
index subsets with masked O(S^2) classification per node:

  * the recursion's early-``break`` tie check (KdTree.cpp:172-177) is a
    pure optimization — rank(left,right) is nondecreasing in j, so the
    final strict `<` test gives the same optimalSplit as full counting;
  * left/right recursion order cannot interact: a split only rewrites the
    split segment's *successor* links and its own far endpoint, and
    classification reads only node POINTS (j1.point, j2.point == seg.p2),
    which other subtrees never mutate;
  * new vertices are convex with the parent's unit direction
    (KdTree.cpp:228-233) — collinear, so directions recompute from the
    final endpoints.

Runs inside the jitted episode reset (obstacles are device-sampled); the
output pads to ``4*O + extra`` segments.  If a layout needs more than
``extra`` splits the surplus segments are left unsplit (overflow flag
returned for tests); extra defaults to 4*O which covers every sampled
layout we measured.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from img_env_tpu.constants import RVO_EPSILON
from img_env_tpu.crowd.orca import Segments

_EPS = RVO_EPSILON


def _left_of(ax, ay, bx, by, cx, cy):
    # leftOf(a,b,c) = det(a-c, b-a)  (Definitions.h)
    return (ax - cx) * (by - ay) - (ay - cy) * (bx - ax)


def split_segments(aabb, valid, extra: int = None) -> Tuple[Segments, jnp.ndarray]:
    """Build post-kd-tree-split boundary segments from [O,4] rectangles.

    Returns (Segments padded to 4*O+extra, overflowed: bool scalar).
    Rectangles follow rvoscene.h:19-26 vertex order (clockwise for pa<pb).
    """
    O = aabb.shape[0]
    s0 = 4 * O
    if extra is None:
        extra = s0
    S = s0 + extra
    DUMP = S                      # scribble slot for masked scatters

    pax, pay, pbx, pby = aabb[:, 0], aabb[:, 1], aabb[:, 2], aabb[:, 3]
    v = jnp.stack([
        jnp.stack([pax, pay], -1), jnp.stack([pax, pby], -1),
        jnp.stack([pbx, pby], -1), jnp.stack([pbx, pay], -1),
    ], axis=1)                    # [O,4,2] node points
    nxt_ring = jnp.roll(v, -1, axis=1)
    prv_ring = jnp.roll(v, 1, axis=1)
    a_min_c = prv_ring - nxt_ring
    b_min_a = v - prv_ring
    conv0 = (a_min_c[..., 0] * b_min_a[..., 1]
             - a_min_c[..., 1] * b_min_a[..., 0]) >= 0.0

    base = 4 * jnp.arange(O)[:, None]
    off = jnp.arange(4)[None, :]
    nxt0 = (base + (off + 1) % 4).reshape(-1)
    prv0 = (base + (off + 3) % 4).reshape(-1)

    pad2 = jnp.zeros((extra + 1, 2))
    p1 = jnp.concatenate([v.reshape(-1, 2), pad2])              # [S+1,2]
    p2 = jnp.concatenate([nxt_ring.reshape(-1, 2), pad2])
    nxt = jnp.concatenate([nxt0, jnp.zeros(extra + 1, jnp.int32)]).astype(jnp.int32)
    prv = jnp.concatenate([prv0, jnp.zeros(extra + 1, jnp.int32)]).astype(jnp.int32)
    convex = jnp.concatenate([conv0.reshape(-1),
                              jnp.zeros(extra + 1, bool)])
    alive = jnp.concatenate([jnp.repeat(valid, 4),
                             jnp.zeros(extra + 1, bool)])

    # stack of ordered index subsets; root = live original segments in order
    depth = S + 2
    stack = jnp.full((depth, S), -1, jnp.int32)
    root_ok = jnp.repeat(valid, 4)
    order = jnp.where(root_ok, jnp.arange(s0), s0)
    perm = jnp.argsort(order)                    # live first, order kept
    root = jnp.where(jnp.arange(S) < root_ok.sum(),
                     jnp.concatenate([perm, jnp.full(extra, -1)])[
                         jnp.arange(S)], -1).astype(jnp.int32)
    stack = stack.at[0].set(root)
    lens = jnp.zeros((depth,), jnp.int32).at[0].set(root_ok.sum().astype(jnp.int32))
    sp = jnp.asarray(1, jnp.int32)
    n_live = jnp.asarray(s0, jnp.int32)
    overflow = jnp.asarray(False)

    idx_a = jnp.arange(S, dtype=jnp.int32)

    def body(carry):
        p1, p2, nxt, prv, convex, alive, stack, lens, sp, n_live, overflow, it = carry
        sp = sp - 1
        sub = stack[sp]
        L = lens[sp]
        ok = (idx_a < L)
        sid = jnp.where(ok, sub, 0)              # subset segment ids

        P1 = p1[sid]                             # node point  (j1.point)
        P2 = p2[sid]                             # next point  (j2.point)

        # --- optimal split selection (full counts; break is a no-op) -----
        jl1 = _left_of(P1[:, None, 0], P1[:, None, 1],
                       P2[:, None, 0], P2[:, None, 1],
                       P1[None, :, 0], P1[None, :, 1])      # [i,j] j1LeftOfI
        jl2 = _left_of(P1[:, None, 0], P1[:, None, 1],
                       P2[:, None, 0], P2[:, None, 1],
                       P2[None, :, 0], P2[None, :, 1])
        pair_ok = ok[:, None] & ok[None, :] & (
            idx_a[:, None] != idx_a[None, :])
        ll = (jl1 >= -_EPS) & (jl2 >= -_EPS)
        rr = jnp.logical_not(ll) & (jl1 <= _EPS) & (jl2 <= _EPS)
        strad = jnp.logical_not(ll) & jnp.logical_not(rr)
        lcnt = jnp.sum(pair_ok & (ll | strad), axis=1).astype(jnp.int32)
        rcnt = jnp.sum(pair_ok & (rr | strad), axis=1).astype(jnp.int32)
        key = (jnp.maximum(lcnt, rcnt) * jnp.asarray(S + 2, jnp.int32)
               + jnp.minimum(lcnt, rcnt))
        key = jnp.where(ok, key, jnp.iinfo(jnp.int32).max)
        i_star = jnp.argmin(key).astype(jnp.int32)                 # first occurrence, like C++

        # --- partition + splits for the chosen segment -------------------
        j1L = jl1[i_star]
        j2L = jl2[i_star]
        act = ok & (idx_a != i_star)
        ll_j = act & (j1L >= -_EPS) & (j2L >= -_EPS)
        rr_j = act & jnp.logical_not(ll_j) & (j1L <= _EPS) & (j2L <= _EPS)
        sp_j = act & jnp.logical_not(ll_j) & jnp.logical_not(rr_j)

        i1p = P1[i_star]
        i2p = P2[i_star]
        den = ((i2p[0] - i1p[0]) * (P1[:, 1] - P2[:, 1])
               - (i2p[1] - i1p[1]) * (P1[:, 0] - P2[:, 0]))
        num = ((i2p[0] - i1p[0]) * (P1[:, 1] - i1p[1])
               - (i2p[1] - i1p[1]) * (P1[:, 0] - i1p[0]))
        t = num / jnp.where(den == 0, 1.0, den)
        split_pt = P1 + t[:, None] * (P2 - P1)

        n_split = jnp.sum(sp_j).astype(jnp.int32)
        cap_left = jnp.asarray(S, jnp.int32) - n_live
        # faithful within capacity: surplus straddlers stay unsplit and are
        # routed whole to the side their first endpoint favors
        rank = (jnp.cumsum(sp_j.astype(jnp.int32)) - 1).astype(jnp.int32)
        can = sp_j & (rank < cap_left)
        dropped = sp_j & jnp.logical_not(can)
        overflow = overflow | jnp.any(dropped)
        new_id = jnp.where(can, n_live + rank, DUMP).astype(jnp.int32)
        src = jnp.where(can, sid, DUMP).astype(jnp.int32)

        old_nxt = nxt[sid]
        p1 = p1.at[new_id].set(jnp.where(can[:, None], split_pt, p1[new_id]))
        p2 = p2.at[new_id].set(jnp.where(can[:, None], P2, p2[new_id]))
        nxt_new = nxt.at[new_id].set(jnp.where(can, old_nxt, nxt[new_id]))
        prv_new = prv.at[new_id].set(jnp.where(can, sid, prv[new_id]))
        convex = convex.at[new_id].set(jnp.where(can, True, convex[new_id]))
        alive = alive.at[new_id].set(jnp.where(can, True, alive[new_id]))
        # shrink parent: far endpoint moves to the split, link to new node
        p2 = p2.at[src].set(jnp.where(can[:, None], split_pt, p2[src]))
        nxt_new = nxt_new.at[src].set(jnp.where(can, new_id, nxt_new[src]))
        prv_new = prv_new.at[jnp.where(can, old_nxt, DUMP)].set(
            jnp.where(can, new_id, prv_new[jnp.where(can, old_nxt, DUMP)]))
        nxt, prv = nxt_new, prv_new
        n_live = n_live + jnp.minimum(n_split, cap_left)

        # --- ordered child subsets (each j contributes <=1 per side) -----
        # dropped (over-capacity) straddlers stay whole and follow their j1
        # side only — faithful splitting resumes when capacity allows
        go_l1 = ll_j | (sp_j & (j1L > 0.0))      # strict, KdTree.cpp:242
        left_el = jnp.where(go_l1, sid,
                            jnp.where(can & jnp.logical_not(j1L > 0.0),
                                      new_id, -1))
        go_r1 = rr_j | (sp_j & jnp.logical_not(j1L > 0.0))
        right_el = jnp.where(go_r1, sid,
                             jnp.where(can & (j1L > 0.0), new_id, -1))

        def compact(el):
            has = el >= 0
            pos = jnp.where(has, jnp.cumsum(has.astype(jnp.int32)) - 1, DUMP).astype(jnp.int32)
            out = jnp.full((S + 1,), -1, jnp.int32)
            out = out.at[pos].set(jnp.where(has, el, -1))
            return out[:S], has.sum().astype(jnp.int32)

        lsub, llen = compact(left_el)
        rsub, rlen = compact(right_el)
        push_l = llen > 1
        push_r = rlen > 1
        stack = stack.at[jnp.where(push_l, sp, depth - 1)].set(lsub)
        lens = lens.at[jnp.where(push_l, sp, depth - 1)].set(llen)
        sp1 = sp + push_l.astype(jnp.int32)
        stack = stack.at[jnp.where(push_r, sp1, depth - 1)].set(rsub)
        lens = lens.at[jnp.where(push_r, sp1, depth - 1)].set(rlen)
        sp = sp1 + push_r.astype(jnp.int32)
        return (p1, p2, nxt, prv, convex, alive, stack, lens, sp, n_live,
                overflow, it + 1)

    def cond(carry):
        sp = carry[8]
        it = carry[11]
        return (sp > 0) & (it < 2 * S + 2)

    init = (p1, p2, nxt, prv, convex, alive, stack, lens, sp, n_live,
            overflow, jnp.asarray(0, jnp.int32))
    p1, p2, nxt, prv, convex, alive, *_rest = jax.lax.while_loop(
        cond, body, init)
    overflow = _rest[4]

    p1, p2 = p1[:S], p2[:S]
    nxt, prv = jnp.clip(nxt[:S], 0, S - 1), jnp.clip(prv[:S], 0, S - 1)
    convex, alive = convex[:S], alive[:S]
    d = p2 - p1
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dn = d / jnp.where(norm == 0, 1.0, norm)
    segs = Segments(
        p1=p1, p2=p2, dir=dn,
        prev_dir=dn[prv], next_dir=dn[nxt],
        convex1=convex, convex2=convex[nxt],
        valid=alive,
    )
    return segs, overflow
