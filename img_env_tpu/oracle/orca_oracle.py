"""Sequential NumPy oracle of the RVO2/ORCA semantics the reference uses.

Implements the same algorithm as crowd/orca.py but in the straightforward
sequential style of the original library (float64, Python loops), to validate
the vectorized JAX solver.  Obstacle segments pass through a faithful
re-implementation of RVO2's kd-tree build (split_segments_from_rects —
KdTree.cpp:131-257), whose segment SPLITTING changes ORCA constraints near
adjacent rectangles; neighbor queries then use the kd-tree's right-side
filter over the split set, sorted by distance (the tree query returns the
same set within range).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

EPS = 0.00001


def det(a, b):
    return a[0] * b[1] - a[1] * b[0]


def norm(v):
    n = math.hypot(v[0], v[1])
    return np.array([v[0] / n, v[1] / n]) if n > 0 else np.zeros(2)


@dataclass
class OSeg:
    p1: np.ndarray
    p2: np.ndarray
    dir: np.ndarray
    prev_dir: np.ndarray
    next_dir: np.ndarray
    convex1: bool
    convex2: bool


def segments_from_rects(aabbs: np.ndarray) -> List[OSeg]:
    segs = []
    for pax, pay, pbx, pby in aabbs:
        v = [
            np.array([pax, pay]), np.array([pax, pby]),
            np.array([pbx, pby]), np.array([pbx, pay]),
        ]
        dirs = [norm(v[(i + 1) % 4] - v[i]) for i in range(4)]
        conv = []
        for i in range(4):
            a, b, c = v[(i - 1) % 4], v[i], v[(i + 1) % 4]
            conv.append(det(a - c, b - a) >= 0.0)
        for i in range(4):
            segs.append(
                OSeg(
                    p1=v[i], p2=v[(i + 1) % 4], dir=dirs[i],
                    prev_dir=dirs[(i - 1) % 4], next_dir=dirs[(i + 1) % 4],
                    convex1=conv[i], convex2=conv[(i + 1) % 4],
                )
            )
    return segs


@dataclass
class _ONode:
    """Obstacle vertex node (RVO::Obstacle): a vertex plus the boundary
    segment from it to ``next``."""

    point: np.ndarray
    prev: Optional["_ONode"] = None
    next: Optional["_ONode"] = None
    convex: bool = False
    unit_dir: Optional[np.ndarray] = None


def _left_of(a, b, c):
    return det(a - c, b - a)


def _build_obstacle_tree(obs: List[_ONode], all_nodes: List[_ONode]) -> None:
    """buildObstacleTreeRecursive (KdTree.cpp:131-257), run for its side
    effect: a segment straddling the chosen partition segment's line is
    SPLIT at the intersection, inserting a collinear convex pseudo-vertex
    into the boundary linked list (KdTree.cpp:219-249)."""
    if not obs:
        return
    size = len(obs)
    optimal_split = 0
    min_left = min_right = size

    def rank(l, r):
        return (max(l, r), min(l, r))

    for i in range(size):
        left_size = right_size = 0
        i1, i2 = obs[i], obs[i].next
        for j in range(size):
            if i == j:
                continue
            j1 = obs[j]
            j2 = j1.next
            j1_left = _left_of(i1.point, i2.point, j1.point)
            j2_left = _left_of(i1.point, i2.point, j2.point)
            if j1_left >= -EPS and j2_left >= -EPS:
                left_size += 1
            elif j1_left <= EPS and j2_left <= EPS:
                right_size += 1
            else:
                left_size += 1
                right_size += 1
            if rank(left_size, right_size) >= rank(min_left, min_right):
                break
        if rank(left_size, right_size) < rank(min_left, min_right):
            min_left, min_right, optimal_split = left_size, right_size, i

    left_obs: List[_ONode] = []
    right_obs: List[_ONode] = []
    i = optimal_split
    i1, i2 = obs[i], obs[i].next
    for j in range(size):
        if i == j:
            continue
        j1 = obs[j]
        j2 = j1.next
        j1_left = _left_of(i1.point, i2.point, j1.point)
        j2_left = _left_of(i1.point, i2.point, j2.point)
        if j1_left >= -EPS and j2_left >= -EPS:
            left_obs.append(j1)
        elif j1_left <= EPS and j2_left <= EPS:
            right_obs.append(j1)
        else:
            t = det(i2.point - i1.point, j1.point - i1.point) / det(
                i2.point - i1.point, j1.point - j2.point)
            split_point = j1.point + t * (j2.point - j1.point)
            new = _ONode(point=split_point, prev=j1, next=j2,
                         convex=True, unit_dir=j1.unit_dir)
            all_nodes.append(new)
            j1.next = new
            j2.prev = new
            if j1_left > 0.0:
                left_obs.append(j1)
                right_obs.append(new)
            else:
                right_obs.append(j1)
                left_obs.append(new)
    _build_obstacle_tree(left_obs, all_nodes)
    _build_obstacle_tree(right_obs, all_nodes)


def split_segments_from_rects(aabbs: np.ndarray) -> List[OSeg]:
    """Segments AFTER RVO2's obstacle kd-tree build: rectangles are added
    vertex-by-vertex (RVOSimulator::addObstacle, RVOSimulator.cpp:130-168,
    in rvoscene.h:19-26 order) and the tree build splits any segment that
    crosses a partition line.  Returns one OSeg per (possibly split)
    boundary segment — the geometry the reference's neighbor query serves."""
    nodes: List[_ONode] = []
    for pax, pay, pbx, pby in aabbs:
        verts = [np.array([pax, pay], float), np.array([pax, pby], float),
                 np.array([pbx, pby], float), np.array([pbx, pay], float)]
        first = len(nodes)
        n = len(verts)
        for i, pt in enumerate(verts):
            nd = _ONode(point=pt.copy())
            if i != 0:
                nd.prev = nodes[-1]
                nd.prev.next = nd
            if i == n - 1:
                nd.next = nodes[first]
                nd.next.prev = nd
            nd.unit_dir = norm(verts[(i + 1) % n] - verts[i])
            nd.convex = _left_of(verts[i - 1], verts[i],
                                 verts[(i + 1) % n]) >= 0.0
            nodes.append(nd)
    _build_obstacle_tree(list(nodes), nodes)
    return [
        OSeg(p1=nd.point, p2=nd.next.point, dir=nd.unit_dir,
             prev_dir=nd.prev.unit_dir, next_dir=nd.next.unit_dir,
             convex1=nd.convex, convex2=nd.next.convex)
        for nd in nodes
    ]


def _dist_sq_seg(a, b, c):
    r = np.dot(c - a, b - a) / max(np.dot(b - a, b - a), 1e-30)
    if r < 0:
        return np.dot(c - a, c - a)
    if r > 1:
        return np.dot(c - b, c - b)
    p = a + r * (b - a)
    return np.dot(c - p, c - p)


def lp1(lines, i, radius, opt_vel, dir_opt, result):
    pt, dr = lines[i]
    dot = np.dot(pt, dr)
    disc = dot * dot + radius * radius - np.dot(pt, pt)
    if disc < 0:
        return result, False
    sq = math.sqrt(disc)
    t_left, t_right = -dot - sq, -dot + sq
    for j in range(i):
        ptj, drj = lines[j]
        denom = det(dr, drj)
        num = det(drj, pt - ptj)
        if abs(denom) <= EPS:
            if num < 0:
                return result, False
            continue
        t = num / denom
        if denom >= 0:
            t_right = min(t_right, t)
        else:
            t_left = max(t_left, t)
        if t_left > t_right:
            return result, False
    if dir_opt:
        t = t_right if np.dot(opt_vel, dr) > 0 else t_left
    else:
        t = np.dot(dr, opt_vel - pt)
        t = min(max(t, t_left), t_right)
    return pt + t * dr, True


def lp2(lines, radius, opt_vel, dir_opt):
    if dir_opt:
        result = opt_vel * radius
    elif np.dot(opt_vel, opt_vel) > radius * radius:
        result = norm(opt_vel) * radius
    else:
        result = opt_vel.copy()
    for i in range(len(lines)):
        pt, dr = lines[i]
        if det(dr, pt - result) > 0:
            new, ok = lp1(lines, i, radius, opt_vel, dir_opt, result)
            if not ok:
                return result, i
            result = new
    return result, len(lines)


def lp3(lines, num_obst, begin, radius, result):
    distance = 0.0
    for i in range(begin, len(lines)):
        pt_i, dr_i = lines[i]
        if det(dr_i, pt_i - result) > distance:
            proj = list(lines[:num_obst])
            for j in range(num_obst, i):
                pt_j, dr_j = lines[j]
                dd = det(dr_i, dr_j)
                if abs(dd) <= EPS:
                    if np.dot(dr_i, dr_j) > 0:
                        continue
                    p = 0.5 * (pt_i + pt_j)
                else:
                    p = pt_i + (det(dr_j, pt_i - pt_j) / dd) * dr_i
                proj.append((p, norm(dr_j - dr_i)))
            temp = result
            opt = np.array([-dr_i[1], dr_i[0]])
            res, fail = lp2(proj, radius, opt, True)
            result = res if fail >= len(proj) else temp
            distance = det(dr_i, pt_i - result)
    return result


def obstacle_lines_for(pos, vel, radius, max_speed, th_obst, segs: List[OSeg], k):
    inv = 1.0 / th_obst
    range_sq = (th_obst * max_speed + radius) ** 2
    cands = []
    for s in segs:
        if det(s.p1 - pos, s.p2 - s.p1) >= 0:       # left-side filter
            continue
        dsq = _dist_sq_seg(s.p1, s.p2, pos)
        if dsq < range_sq:
            cands.append((dsq, s))
    cands.sort(key=lambda x: x[0])
    cands = cands[:k]

    lines = []
    r_sq = radius * radius
    for _, s in cands:
        rel1, rel2 = s.p1 - pos, s.p2 - pos

        covered = False
        for pt, dr in lines:
            if (
                det(inv * rel1 - pt, dr) - inv * radius >= -EPS
                and det(inv * rel2 - pt, dr) - inv * radius >= -EPS
            ):
                covered = True
                break
        if covered:
            continue

        d1sq, d2sq = np.dot(rel1, rel1), np.dot(rel2, rel2)
        ovec = s.p2 - s.p1
        t_s = np.dot(-rel1, ovec) / np.dot(ovec, ovec)
        dline = -rel1 - t_s * ovec
        dlsq = np.dot(dline, dline)

        if t_s < 0 and d1sq <= r_sq:
            if s.convex1:
                lines.append((np.zeros(2), norm(np.array([-rel1[1], rel1[0]]))))
            continue
        if t_s > 1 and d2sq <= r_sq:
            if s.convex2 and det(rel2, s.next_dir) >= 0:
                lines.append((np.zeros(2), norm(np.array([-rel2[1], rel2[0]]))))
            continue
        if 0 <= t_s < 1 and dlsq <= r_sq:
            lines.append((np.zeros(2), -s.dir))
            continue

        if t_s < 0 and dlsq <= r_sq:
            if not s.convex1:
                continue
            o1p, o2p = s.p1, s.p1
            conv1, conv2 = s.convex1, s.convex1
            dir_o1, dir_o2, left_nb = s.dir, s.dir, s.prev_dir
            leg1 = math.sqrt(d1sq - r_sq)
            lleg = np.array([rel1[0] * leg1 - rel1[1] * radius,
                             rel1[0] * radius + rel1[1] * leg1]) / d1sq
            rleg = np.array([rel1[0] * leg1 + rel1[1] * radius,
                             -rel1[0] * radius + rel1[1] * leg1]) / d1sq
        elif t_s > 1 and dlsq <= r_sq:
            if not s.convex2:
                continue
            o1p, o2p = s.p2, s.p2
            conv1, conv2 = s.convex2, s.convex2
            dir_o1, dir_o2, left_nb = s.next_dir, s.next_dir, s.dir
            leg2 = math.sqrt(d2sq - r_sq)
            lleg = np.array([rel2[0] * leg2 - rel2[1] * radius,
                             rel2[0] * radius + rel2[1] * leg2]) / d2sq
            rleg = np.array([rel2[0] * leg2 + rel2[1] * radius,
                             -rel2[0] * radius + rel2[1] * leg2]) / d2sq
        else:
            o1p, o2p = s.p1, s.p2
            conv1, conv2 = s.convex1, s.convex2
            dir_o1, dir_o2, left_nb = s.dir, s.next_dir, s.prev_dir
            if conv1:
                leg1 = math.sqrt(d1sq - r_sq)
                lleg = np.array([rel1[0] * leg1 - rel1[1] * radius,
                                 rel1[0] * radius + rel1[1] * leg1]) / d1sq
            else:
                lleg = -s.dir
            if conv2:
                leg2 = math.sqrt(d2sq - r_sq)
                rleg = np.array([rel2[0] * leg2 + rel2[1] * radius,
                                 -rel2[0] * radius + rel2[1] * leg2]) / d2sq
            else:
                rleg = s.dir

        left_foreign = conv1 and det(lleg, -left_nb) >= 0
        if left_foreign:
            lleg = -left_nb
        right_foreign = conv2 and det(rleg, dir_o2) <= 0
        if right_foreign:
            rleg = dir_o2

        left_cut = inv * (o1p - pos)
        right_cut = inv * (o2p - pos)
        cut_vec = right_cut - left_cut
        same = np.array_equal(o1p, o2p)

        t = 0.5 if same else np.dot(vel - left_cut, cut_vec) / max(np.dot(cut_vec, cut_vec), 1e-30)
        t_l = np.dot(vel - left_cut, lleg)
        t_r = np.dot(vel - right_cut, rleg)

        if (t < 0 and t_l < 0) or (same and t_l < 0 and t_r < 0):
            uw = norm(vel - left_cut)
            lines.append((left_cut + radius * inv * uw, np.array([uw[1], -uw[0]])))
            continue
        if t > 1 and t_r < 0:
            uw = norm(vel - right_cut)
            lines.append((right_cut + radius * inv * uw, np.array([uw[1], -uw[0]])))
            continue

        d_cut = math.inf if (t < 0 or t > 1 or same) else float(
            np.dot(vel - (left_cut + t * cut_vec), vel - (left_cut + t * cut_vec)))
        d_l = math.inf if t_l < 0 else float(
            np.dot(vel - (left_cut + t_l * lleg), vel - (left_cut + t_l * lleg)))
        d_r = math.inf if t_r < 0 else float(
            np.dot(vel - (right_cut + t_r * rleg), vel - (right_cut + t_r * rleg)))

        if d_cut <= d_l and d_cut <= d_r:
            d = -dir_o1
            lines.append((left_cut + radius * inv * np.array([-d[1], d[0]]), d))
        elif d_l <= d_r:
            if left_foreign:
                continue
            d = lleg
            lines.append((left_cut + radius * inv * np.array([-d[1], d[0]]), d))
        else:
            if right_foreign:
                continue
            d = -rleg
            lines.append((right_cut + radius * inv * np.array([-d[1], d[0]]), d))
    return lines


def agent_lines_for(
    pos, vel, radius, i,
    all_pos, all_vel, all_radius,
    neighbor_dist, max_neighbors, th, time_step,
):
    cands = []
    for j in range(len(all_pos)):
        if j == i:
            continue
        dsq = float(np.dot(all_pos[j] - pos, all_pos[j] - pos))
        if dsq < neighbor_dist**2:
            cands.append((dsq, j))
    cands.sort(key=lambda x: x[0])
    cands = cands[:max_neighbors]

    lines = []
    inv_th, inv_ts = 1.0 / th, 1.0 / time_step
    for _, j in cands:
        rel_p = all_pos[j] - pos
        rel_v = vel - all_vel[j]
        dsq = np.dot(rel_p, rel_p)
        cr = radius + all_radius[j]
        cr_sq = cr * cr
        if dsq > cr_sq:
            w = rel_v - inv_th * rel_p
            wsq = np.dot(w, w)
            dot1 = np.dot(w, rel_p)
            if dot1 < 0 and dot1 * dot1 > cr_sq * wsq:
                wl = math.sqrt(wsq)
                uw = w / wl
                dr = np.array([uw[1], -uw[0]])
                u = (cr * inv_th - wl) * uw
            else:
                leg = math.sqrt(dsq - cr_sq)
                if det(rel_p, w) > 0:
                    dr = np.array([rel_p[0] * leg - rel_p[1] * cr,
                                   rel_p[0] * cr + rel_p[1] * leg]) / dsq
                else:
                    dr = -np.array([rel_p[0] * leg + rel_p[1] * cr,
                                    -rel_p[0] * cr + rel_p[1] * leg]) / dsq
                u = np.dot(rel_v, dr) * dr - rel_v
        else:
            w = rel_v - inv_ts * rel_p
            wl = math.hypot(w[0], w[1])
            uw = w / wl if wl > 0 else np.zeros(2)
            dr = np.array([uw[1], -uw[0]])
            u = (cr * inv_ts - wl) * uw
        lines.append((vel + 0.5 * u, dr))
    return lines


def solve_velocity(
    pos, vel, pref, radius, max_speed, i,
    all_pos, all_vel, all_radius, segs,
    neighbor_dist=0.5, max_neighbors=10, th=5.0, th_obst=5.0,
    time_step=0.4, max_obs_segments=16,
):
    olines = obstacle_lines_for(pos, vel, radius, max_speed, th_obst, segs, max_obs_segments)
    alines = agent_lines_for(
        pos, vel, radius, i, all_pos, all_vel, all_radius,
        neighbor_dist, max_neighbors, th, time_step,
    )
    lines = olines + alines
    result, fail = lp2(lines, max_speed, pref, False)
    if fail < len(lines):
        result = lp3(lines, len(olines), fail, max_speed, result)
    return result


def orca_oracle_step(
    ped_pos, ped_vel, ped_pref, ped_radius, ped_max_speed,
    robot_pos, robot_vel, aabbs,
    time_step=0.4, robot_radius=0.5,
    evac_sources=None, evac_radii=None, split=True,
):
    """Full crowd step: all peds solved against peds+robots, Euler update.
    ``split=True`` (default — the reference's actual behavior) serves
    segments through the faithful kd-tree build (split_segments_from_rects);
    ``split=False`` uses the raw unsplit rectangle edges."""
    if len(aabbs):
        segs = (split_segments_from_rects(aabbs) if split
                else segments_from_rects(aabbs))
    else:
        segs = []
    m = len(ped_pos)
    all_pos = np.concatenate([ped_pos, robot_pos], axis=0)
    all_vel = np.concatenate([ped_vel, robot_vel], axis=0)
    all_radius = np.concatenate(
        [ped_radius, np.full(len(robot_pos), robot_radius)]
    )
    new_vel = np.zeros_like(ped_vel)
    for i in range(m):
        new_vel[i] = solve_velocity(
            ped_pos[i], ped_vel[i], ped_pref[i], ped_radius[i],
            ped_max_speed[i], i, all_pos, all_vel, all_radius, segs,
            time_step=time_step,
        )
        if evac_sources is not None:
            for src, rs in zip(evac_sources, evac_radii):
                ev = ped_pos[i] - src
                d = math.hypot(ev[0], ev[1])
                if 1e-4 <= d <= rs:
                    new_vel[i] = new_vel[i] + ev / d
    new_pos = ped_pos + new_vel * time_step
    return new_pos, new_vel
