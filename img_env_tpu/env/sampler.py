"""Episode scenario sampling (EnvPos equivalent, reset_helper.py:104-345).

The reference rejection-samples with unbounded while loops on the host.  Here
sampling is a jitted, seeded function: every agent draws a fixed batch of
candidate poses, validity is evaluated vectorized, and the first valid
candidate wins.  Sequential clearance dependencies (each agent must avoid the
agents placed before it) are kept by scanning agents in order.

Pose-type semantics preserved (reset_helper.py:189-300):
  * ``fix`` / ``rand_angle`` poses are assigned up-front and visible to all
    clearance checks;
  * ``range`` draws uniformly from a 4- or 6-element box;
  * ``range_circle`` places starts on a circle of radius U(circle_ranges)
    with Gaussian (0, 0.5) position noise, goals diametrically opposite (the
    stored start angle already includes the +pi);
  * ``..._fix`` start angles are spaced -pi + (2pi/A)*i;
  * ``range_view`` draws goals from the [2.5, 4] annulus-box around the start;
  * clearance: >1 m between agent starts (and between goals), and
    2*module_size + obstacle_radius against obstacles; goals also need
    ``target_min_dist`` from the own start.

Failure recovery: the reference re-rolls entire circle layouts after 50
failures and retries reset up to 10x (reset_helper.py:251-258,
yaml_env.py:304-311).  Here each agent draws T bounded trials; if any agent
fails to place, the sample reports ``ok=False`` and
``sample_scenario_retry`` re-draws the WHOLE scenario with a folded key up
to ``reset_redraws`` times — the path NavEnv.reset_fn uses.

``*_multi`` pose types (a list of candidate regions, one picked uniformly
per attempt — reset_helper.py:239,274) are supported for begin and target
poses, composing with range/view semantics.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.config import EnvConfig
from img_env_tpu.ops.footprint import bounding_radius

# pose-type codes
FIX = 0
RAND_ANGLE = 1
RANGE4 = 2
RANGE6 = 3
RANGE_CIRCLE = 4
RANGE_CIRCLE_FIX = 5
RANGE_VIEW = 6
CIRCLE_FIX = 7  # deterministic opposite (no 'range' prefix)

_VIEW_BOX = (2.5, 4.0, 2.5, 4.0)  # task_view (reset_helper.py:70)


def _encode_region(t: str, arr: np.ndarray) -> np.ndarray:
    p = np.zeros(6, np.float64)
    if "circle" in t:
        p[: min(2, arr.size)] = arr[:2]
    elif "view" in t:
        p[: min(4, arr.size)] = arr[:4]
    elif t == "fix" or t == "rand_angle":
        p[: min(6, arr.size)] = arr[:6]
    elif arr.size >= 6:
        p[:6] = arr[:6]
    else:
        p[:4] = arr[:4]
        p[4], p[5] = -3.14, 3.14
    return p


def _encode_type(t: str, params) -> Tuple[int, np.ndarray]:
    """-> (code, regions [R,6]).  ``*_multi`` pose types carry a LIST of
    candidate regions, one picked uniformly per attempt
    (reset_helper.py:239,274); every other type has exactly one region."""
    if "multi" in t and len(params) and isinstance(params[0], (list, tuple)):
        regions = np.stack([
            _encode_region(t, np.asarray(r, np.float64).reshape(-1))
            for r in params])
    else:
        regions = _encode_region(
            t, np.asarray(params, np.float64).reshape(-1))[None]
    if "circle" in t:
        if "fix" in t and "range" not in t:
            return CIRCLE_FIX, regions
        if "fix" in t:
            return RANGE_CIRCLE_FIX, regions
        return RANGE_CIRCLE, regions
    if "view" in t:
        return RANGE_VIEW, regions
    if t == "fix":
        return FIX, regions
    if t == "rand_angle":
        return RAND_ANGLE, regions
    first = params[0] if ("multi" in t and len(params)
                          and isinstance(params[0], (list, tuple))) else params
    if np.asarray(first, np.float64).reshape(-1).size >= 6:
        return RANGE6, regions
    return RANGE4, regions


class SamplerSpec(NamedTuple):
    """Static per-config sampling spec (host numpy, closed over by jit)."""

    # obstacles
    obs_shape_circle: np.ndarray   # [O] bool
    obs_size_range: np.ndarray     # [O,4]
    obs_type: np.ndarray           # [O] int (FIX or RANGE4/6)
    obs_params: np.ndarray         # [O,6]
    # agents (robots then peds)
    begin_type: np.ndarray         # [A]
    begin_params: np.ndarray       # [A,R,6] candidate regions per agent
    begin_nreg: np.ndarray         # [A] live region count (rest padded)
    target_type: np.ndarray        # [A]
    target_params: np.ndarray      # [A,R,6]
    target_nreg: np.ndarray        # [A]
    module_size: np.ndarray        # [A]
    n_robots: int
    n_peds: int
    circle_ranges: Tuple[float, float]
    target_min_dist: float
    go_back_mode: int              # 0 no, 1 yes, 2 random
    trials: int
    redraws: int                   # whole-scenario re-draws on ok=False

    @staticmethod
    def from_config(cfg: EnvConfig) -> "SamplerSpec":
        o = cfg.object.total
        obs_circle = np.zeros(o, bool)
        obs_sr = np.zeros((o, 4), np.float64)
        obs_t = np.zeros(o, np.int64)
        obs_p = np.zeros((o, 6), np.float64)
        for i in range(o):
            obs_circle[i] = cfg.object.shape[i] == "circle"
            sr = np.asarray(cfg.object.size_range[i], np.float64)
            obs_sr[i, : sr.size] = sr
            t = cfg.object.poses_type[i]
            pr = np.asarray(cfg.object.poses[i], np.float64)
            if t == "fix":
                obs_t[i] = FIX
                obs_p[i, : pr.size] = pr
            else:
                obs_t[i], obs_p[i] = _encode_type("range", pr)

        n, m = cfg.robot.total, cfg.ped_sim.total
        a = n + m
        bt = np.zeros(a, np.int64)
        tt = np.zeros(a, np.int64)
        mod = np.zeros(a, np.float64)
        b_regs, t_regs = [], []
        for i in range(a):
            if i < n:
                sh, sz = cfg.robot.shape[i], cfg.robot.size[i]
                b_t, b_p = cfg.robot.begin_poses_type[i], cfg.robot.begin_poses[i]
                g_t, g_p = cfg.robot.target_poses_type[i], cfg.robot.target_poses[i]
            else:
                j = i - n
                sh, sz = cfg.ped_sim.shape[j], cfg.ped_sim.size[j]
                b_t, b_p = cfg.ped_sim.begin_poses_type[j], cfg.ped_sim.begin_poses[j]
                g_t, g_p = cfg.ped_sim.target_poses_type[j], cfg.ped_sim.target_poses[j]
            mod[i] = bounding_radius(sh, sz)
            bt[i], br = _encode_type(b_t, b_p)
            tt[i], tr = _encode_type(g_t, g_p)
            b_regs.append(br)
            t_regs.append(tr)
        rmax = max([r.shape[0] for r in b_regs + t_regs] or [1])
        bp = np.zeros((a, rmax, 6), np.float64)
        tp = np.zeros((a, rmax, 6), np.float64)
        bn = np.ones(a, np.int64)
        tn = np.ones(a, np.int64)
        for i in range(a):
            bn[i] = b_regs[i].shape[0]
            bp[i, : bn[i]] = b_regs[i]
            bp[i, bn[i]:] = b_regs[i][-1]       # pad with last (never drawn)
            tn[i] = t_regs[i].shape[0]
            tp[i, : tn[i]] = t_regs[i]
            tp[i, tn[i]:] = t_regs[i][-1]
        gb = {"no": 0, "yes": 1, "random": 2}[cfg.ped_sim.go_back]
        return SamplerSpec(
            obs_shape_circle=obs_circle, obs_size_range=obs_sr,
            obs_type=obs_t, obs_params=obs_p,
            begin_type=bt, begin_params=bp, begin_nreg=bn,
            target_type=tt, target_params=tp, target_nreg=tn,
            module_size=mod, n_robots=n, n_peds=m,
            circle_ranges=tuple(cfg.circle_ranges),
            target_min_dist=float(cfg.target_min_dist),
            go_back_mode=gb, trials=int(cfg.reset_trials),
            redraws=int(cfg.reset_redraws),
        )


class ScenarioSample(NamedTuple):
    obs_pose: jnp.ndarray      # [O,3]
    obs_radius: jnp.ndarray    # [O] clearance radius (circle r or rect diag)
    obs_circle_r: jnp.ndarray  # [O] sampled circle radius (rects: 0)
    init_poses: jnp.ndarray    # [A,3] robots then peds
    target_poses: jnp.ndarray  # [A,3]
    go_back: jnp.ndarray       # [M] bool
    ok: jnp.ndarray            # [] bool all agents placed cleanly


def _propose(key, code, regions, nreg, i, n_agents, circle_range, init_pose,
             trials):
    """-> ([T,3] candidate poses, [T,6] per-trial selected region params).

    regions: [R,6] candidate boxes; ``*_multi`` pose types pick one region
    uniformly per attempt (reset_helper.py:239,274) — here per trial.
    """
    ks = jax.random.split(key, 4)
    u = jax.random.uniform(ks[0], (trials, 3))
    gauss = jax.random.normal(ks[1], (trials, 2)) * 0.5
    ridx = jax.random.randint(ks[2], (trials,), 0, nreg)
    p = regions[ridx]                                   # [T,6]
    box_x = p[:, 0] + u[:, 0] * (p[:, 1] - p[:, 0])
    box_y = p[:, 2] + u[:, 1] * (p[:, 3] - p[:, 2])
    box_th = p[:, 4] + u[:, 2] * (p[:, 5] - p[:, 4])

    angle_rand = -3.14 + u[:, 0] * 6.28
    angle_fix = jnp.full((trials,), -3.14 + (6.28 / n_agents) * i)
    angle_from_init = jnp.full((trials,), init_pose[2])

    def mk_circle(angle, yaw_off, noisy):
        x = circle_range * jnp.cos(angle) + p[:, 0]
        y = circle_range * jnp.sin(angle) + p[:, 1]
        if noisy:
            x = x + gauss[:, 0]
            y = y + gauss[:, 1]
        return jnp.stack([x, y, angle + yaw_off], -1)

    # range_view: uniform over the big box around init
    vx = init_pose[0] - _VIEW_BOX[1] + u[:, 0] * (2 * _VIEW_BOX[1])
    vy = init_pose[1] - _VIEW_BOX[3] + u[:, 1] * (2 * _VIEW_BOX[3])
    vth = -3.14 + u[:, 2] * 6.28
    view_pose = jnp.stack([vx, vy, vth], -1)

    fix_pose = jnp.broadcast_to(regions[0, :3], (trials, 3))
    rand_angle = jnp.stack(
        [p[:, 0], p[:, 1], p[:, 2] + u[:, 2] * (p[:, 3] - p[:, 2])], -1)
    box_pose = jnp.stack([box_x, box_y, box_th], -1)

    cands = jnp.stack(
        [
            fix_pose,                                   # FIX
            rand_angle,                                 # RAND_ANGLE
            box_pose,                                   # RANGE4
            box_pose,                                   # RANGE6
            mk_circle(angle_rand, 3.14, True),          # RANGE_CIRCLE (begin)
            mk_circle(angle_fix, 3.14, True),           # RANGE_CIRCLE_FIX
            view_pose,                                  # RANGE_VIEW
            mk_circle(angle_from_init, -3.14, False),   # CIRCLE_FIX (target)
        ]
    )
    return cands[code], p


def _target_propose(key, code, regions, nreg, i, n_agents, circle_range,
                    init_pose, trials):
    """Target candidates: circle targets derive the angle from the start."""
    base, p = _propose(key, code, regions, nreg, i, n_agents, circle_range,
                       init_pose, trials)
    gauss = jax.random.normal(jax.random.fold_in(key, 7), (trials, 2)) * 0.5
    angle = init_pose[2]
    cx = circle_range * jnp.cos(angle) + p[:, 0] + gauss[:, 0]
    cy = circle_range * jnp.sin(angle) + p[:, 1] + gauss[:, 1]
    circ = jnp.stack(
        [cx, cy, jnp.full((trials,), angle - 3.14)], -1
    )
    is_circle_range = (code == RANGE_CIRCLE) | (code == RANGE_CIRCLE_FIX)
    return jnp.where(is_circle_range, circ, base), p


def _clear_of_agents(cand_xy, poses, filled):
    d = jnp.linalg.norm(cand_xy[:, None, :] - poses[None, :, :2], axis=-1)
    bad = (d <= 1.0) & filled[None, :]
    return jnp.logical_not(jnp.any(bad, axis=1))


def _clear_of_obstacles(cand_xy, module, obs_pose, obs_radius):
    d = jnp.linalg.norm(cand_xy[:, None, :] - obs_pose[None, :, :2], axis=-1)
    thresh = 2.0 * module + obs_radius[None, :]
    bad = (d <= thresh) & (obs_radius[None, :] != 0.0)
    return jnp.logical_not(jnp.any(bad, axis=1))


def _view_extra_valid(cands, code, init_pose, params):
    """params: [T,6] per-trial selected region."""
    inner = (
        (cands[:, 0] >= init_pose[0] - _VIEW_BOX[0])
        & (cands[:, 0] <= init_pose[0] + _VIEW_BOX[0])
        & (cands[:, 1] >= init_pose[1] - _VIEW_BOX[2])
        & (cands[:, 1] <= init_pose[1] + _VIEW_BOX[2])
    )
    in_range = (
        (cands[:, 0] >= params[:, 0]) & (cands[:, 0] <= params[:, 1])
        & (cands[:, 1] >= params[:, 2]) & (cands[:, 1] <= params[:, 3])
    )
    ok = jnp.logical_not(inner) & in_range
    return jnp.where(code == RANGE_VIEW, ok, True)


def sample_scenario(key, spec: SamplerSpec) -> ScenarioSample:
    o = spec.obs_type.shape[0]
    a = spec.begin_type.shape[0]
    t = spec.trials
    k_obs, k_cr, k_agents, k_gb = jax.random.split(key, 4)

    circle_range = jax.random.uniform(
        k_cr, (), minval=spec.circle_ranges[0], maxval=spec.circle_ranges[1]
    )

    # ---- obstacles (no clearance checks, reset_helper.py:122-165) ----
    if o > 0:
        ku = jax.random.split(k_obs, o)
        u = jax.random.uniform(k_obs, (o, 4))
        sr = jnp.asarray(spec.obs_size_range)
        circ_r = sr[:, 0] + u[:, 3] * (sr[:, 1] - sr[:, 0])
        rect_r = jnp.sqrt(sr[:, 0] ** 2 + sr[:, 2] ** 2)
        is_circ = jnp.asarray(spec.obs_shape_circle)
        radius = jnp.where(is_circ, circ_r, rect_r)

        p = jnp.asarray(spec.obs_params)
        x = p[:, 0] + u[:, 0] * (p[:, 1] - p[:, 0])
        y = p[:, 2] + u[:, 1] * (p[:, 3] - p[:, 2])
        th = p[:, 4] + u[:, 2] * (p[:, 5] - p[:, 4])
        is_fix = jnp.asarray(spec.obs_type) == FIX
        pose = jnp.where(
            is_fix[:, None],
            jnp.stack([p[:, 0], p[:, 1], p[:, 2]], -1),
            jnp.stack([x, y, th], -1),
        )
        obs_pose = pose
        obs_radius = radius
        obs_circle_r = jnp.where(is_circ, circ_r, 0.0)
    else:
        obs_pose = jnp.zeros((0, 3))
        obs_radius = jnp.zeros((0,))
        obs_circle_r = jnp.zeros((0,))

    # ---- pre-fill fixed agent poses ----
    bt = jnp.asarray(spec.begin_type)
    bp = jnp.asarray(spec.begin_params)       # [A,R,6]
    bn = jnp.asarray(spec.begin_nreg)
    tt = jnp.asarray(spec.target_type)
    tp = jnp.asarray(spec.target_params)
    tn = jnp.asarray(spec.target_nreg)
    mod = jnp.asarray(spec.module_size)

    init_poses = jnp.zeros((a, 3))
    target_poses = jnp.zeros((a, 3))
    init_filled = jnp.zeros((a,), bool)
    target_filled = jnp.zeros((a,), bool)

    kf = jax.random.split(k_agents, a + 1)
    pre_u = jax.random.uniform(kf[a], (a,))
    bp0, tp0 = bp[:, 0], tp[:, 0]             # fix/rand_angle: single region
    fix_init = jnp.stack([bp0[:, 0], bp0[:, 1], bp0[:, 2]], -1)
    ra_init = jnp.stack(
        [bp0[:, 0], bp0[:, 1], bp0[:, 2] + pre_u * (bp0[:, 3] - bp0[:, 2])], -1
    )
    init_poses = jnp.where((bt == FIX)[:, None], fix_init, init_poses)
    init_poses = jnp.where((bt == RAND_ANGLE)[:, None], ra_init, init_poses)
    init_filled = (bt == FIX) | (bt == RAND_ANGLE)
    fix_tgt = jnp.stack([tp0[:, 0], tp0[:, 1], tp0[:, 2]], -1)
    ra_tgt = jnp.stack(
        [tp0[:, 0], tp0[:, 1], tp0[:, 2] + pre_u * (tp0[:, 3] - tp0[:, 2])], -1
    )
    target_poses = jnp.where((tt == FIX)[:, None], fix_tgt, target_poses)
    target_poses = jnp.where((tt == RAND_ANGLE)[:, None], ra_tgt, target_poses)
    target_filled = (tt == FIX) | (tt == RAND_ANGLE)

    # ---- sequential placement scan ----
    def body(carry, xs):
        init_poses, target_poses, init_filled, target_filled, all_ok = carry
        i, ki = xs
        k_b, k_t = jax.random.split(ki)

        need_b = jnp.logical_not(init_filled[i])
        cands, _ = _propose(k_b, bt[i], bp[i], bn[i], i, a, circle_range,
                            init_poses[i], t)
        valid = (
            _clear_of_agents(cands[:, :2], init_poses, init_filled)
            & _clear_of_obstacles(cands[:, :2], mod[i], obs_pose, obs_radius)
        )
        pick = jnp.argmax(valid)
        got = jnp.any(valid)
        new_init = jnp.where(need_b, cands[pick], init_poses[i])
        init_poses = init_poses.at[i].set(new_init)
        init_filled = init_filled.at[i].set(True)
        all_ok = all_ok & (got | jnp.logical_not(need_b))

        need_t = jnp.logical_not(target_filled[i])
        tc, tsel = _target_propose(
            k_t, tt[i], tp[i], tn[i], i, a, circle_range, init_poses[i], t
        )
        tvalid = (
            (jnp.sum((tc[:, :2] - init_poses[i, :2]) ** 2, -1)
             > spec.target_min_dist**2)
            & _clear_of_agents(tc[:, :2], target_poses, target_filled)
            & _clear_of_obstacles(tc[:, :2], mod[i], obs_pose, obs_radius)
            & _view_extra_valid(tc, tt[i], init_poses[i], tsel)
        )
        # deterministic circle_fix target skips checks (reset_helper.py:260-265)
        det = tt[i] == CIRCLE_FIX
        tvalid = jnp.where(det, jnp.ones_like(tvalid), tvalid)
        tpick = jnp.argmax(tvalid)
        tgot = jnp.any(tvalid)
        new_tgt = jnp.where(need_t, tc[tpick], target_poses[i])
        target_poses = target_poses.at[i].set(new_tgt)
        target_filled = target_filled.at[i].set(True)
        all_ok = all_ok & (tgot | jnp.logical_not(need_t))
        return (init_poses, target_poses, init_filled, target_filled, all_ok), None

    (init_poses, target_poses, _, _, ok), _ = jax.lax.scan(
        body,
        (init_poses, target_poses, init_filled, target_filled, jnp.asarray(True)),
        (jnp.arange(a), kf[:a]),
    )

    m = spec.n_peds
    if spec.go_back_mode == 1:
        go_back = jnp.ones((m,), bool)
    elif spec.go_back_mode == 0:
        go_back = jnp.zeros((m,), bool)
    else:
        go_back = jax.random.uniform(k_gb, (m,)) > 0.5

    return ScenarioSample(
        obs_pose=obs_pose, obs_radius=obs_radius, obs_circle_r=obs_circle_r,
        init_poses=init_poses, target_poses=target_poses,
        go_back=go_back, ok=ok,
    )


def sample_scenario_retry(key, spec: SamplerSpec) -> ScenarioSample:
    """Bounded whole-scenario re-draw when placement fails (ok=False).

    Mirrors the reference's recovery: circle layouts re-roll everyone after
    50 rejection failures (reset_helper.py:251-258) and the frontend retries
    reset up to 10 times (yaml_env.py:304-311).  Each re-draw folds the key,
    so replay-by-key stays deterministic.
    """
    s0 = sample_scenario(key, spec)
    if spec.redraws <= 0:
        return s0

    def cond(carry):
        i, s = carry
        return jnp.logical_not(s.ok) & (i < spec.redraws)

    def body(carry):
        i, _ = carry
        s = sample_scenario(jax.random.fold_in(key, i + 1), spec)
        return i + 1, s

    _, s = jax.lax.while_loop(cond, body, (jnp.int32(0), s0))
    return s


def obstacle_corners(obs_pose, spec: SamplerSpec, obs_circle_r):
    """World-frame (pax,pay,pbx,pby) per obstacle — Agent::get_corners
    (agent.cpp:626-651), with the pose rotation applied (no AABB min/max)."""
    sr = jnp.asarray(spec.obs_size_range)
    is_circ = jnp.asarray(spec.obs_shape_circle)
    r = obs_circle_r
    pa_base = jnp.where(
        is_circ[:, None],
        jnp.stack([-r, -r], -1),
        jnp.stack([sr[:, 0], sr[:, 2]], -1),
    )
    pb_base = jnp.where(
        is_circ[:, None],
        jnp.stack([r, r], -1),
        jnp.stack([sr[:, 1], sr[:, 3]], -1),
    )
    c, s = jnp.cos(obs_pose[:, 2]), jnp.sin(obs_pose[:, 2])
    rot = lambda p: jnp.stack(
        [c * p[:, 0] - s * p[:, 1] + obs_pose[:, 0],
         s * p[:, 0] + c * p[:, 1] + obs_pose[:, 1]], -1)
    pa, pb = rot(pa_base), rot(pb_base)
    return jnp.concatenate([pa, pb], -1)
