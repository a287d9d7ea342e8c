"""iLQR over the smooth unicycle dynamics with parallel-scan Riccati.

Completes the derivative-based half of the MPC engine (SURVEY.md §7.2 M4):
linearize the dynamics with autodiff, Gauss-Newton-quadraticize the smooth
planning cost, solve the time-varying LQT backward pass with the O(log H)
associative scan (mpc/lqr.py), forward-roll with a vmapped parallel line
search, iterate a fixed number of times (jit-friendly: no data-dependent
control flow).

Dynamics use a sinc-form arc step so gradients are well-defined at w = 0
(the sim's exact-arc branch divides by w, mpc docstring in
dynamics/kinematics.py — both agree to machine precision away from 0).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from img_env_tpu.mpc.cost import (
    CostWeights,
    WorldCost,
    ped_clearance_at,
    static_distance_smooth,
)
from img_env_tpu.mpc.lqr import LqtProblem, lqt_backward_assoc


class IlqrConfig(NamedTuple):
    horizon: int = 16
    iters: int = 8
    mu: float = 1e-3                 # Levenberg regularization on Quu
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03)
    v_range: Tuple[float, float] = (0.0, 0.6)
    w_range: Tuple[float, float] = (-0.9, 0.9)


def smooth_step(x, u, dt: float):
    """x=[px,py,yaw], u=[v,w] -> next x via the arc integral in sinc form.

    px' = px + v*dt*sinc(w dt/2)... exactly:
      dx = v/w (sin(th+w dt) - sin th) = v dt * S(w dt) where
      S(a) = (sin(th+a) - sin(th)) / a, computed stably via the midpoint
      identity S = sinc(a/2) * cos(th + a/2).
    """
    th, v, w = x[2], u[0], u[1]
    a = w * dt
    half = 0.5 * a
    sinc = jnp.where(jnp.abs(half) < 1e-6,
                     1.0 - half * half / 6.0,
                     jnp.sin(half) / jnp.where(half == 0, 1.0, half))
    dx = v * dt * sinc * jnp.cos(th + half)
    dy = v * dt * sinc * jnp.sin(th + half)
    return jnp.stack([x[0] + dx, x[1] + dy, th + a])


def _stage_cost(wc: WorldCost, w8: CostWeights, goal,
                ped_traj, ped_r, dt: float, x, u, t):
    xy = x[:2]
    goal_d = jnp.sum((goal - xy) ** 2)
    sd = static_distance_smooth(wc, xy) - wc.robot_radius
    hinge = jax.nn.softplus((w8.safety_dist - sd) * 8.0) / 8.0
    ped_t = ped_traj[jnp.minimum(t, ped_traj.shape[0] - 1)]
    pd = ped_clearance_at(xy[None], ped_t, ped_r)[0] - wc.robot_radius
    ped_hinge = jax.nn.softplus((w8.ped_safety - pd) * 8.0) / 8.0
    return (w8.goal * goal_d
            + w8.clearance * hinge ** 2 * 4.0
            + w8.ped_weight * ped_hinge ** 2
            + w8.effort_v * u[0] ** 2 + w8.effort_w * u[1] ** 2)


def _terminal_cost(wc: WorldCost, w8: CostWeights, goal, x):
    return w8.terminal_goal * jnp.sum((goal - x[:2]) ** 2)


def ilqr_solve(
    x0, goal, us_init,
    wc: WorldCost,
    ped_traj, ped_r,
    cfg: IlqrConfig, w8: CostWeights = CostWeights(),
    dt: float = 0.4,
):
    """Returns (us [H,2], xs [H+1,3], total cost). Fully jittable."""
    h = cfg.horizon
    n, m = 3, 2
    lo = jnp.asarray([cfg.v_range[0], cfg.w_range[0]])
    hi = jnp.asarray([cfg.v_range[1], cfg.w_range[1]])

    if ped_traj.ndim == 2:  # back-compat: [M,2] static peds -> frozen traj
        ped_traj = jnp.broadcast_to(
            ped_traj[None], (cfg.horizon,) + ped_traj.shape)
    stage = functools.partial(_stage_cost, wc, w8, goal, ped_traj,
                              ped_r, dt)
    term = functools.partial(_terminal_cost, wc, w8, goal)
    dyn = lambda x, u: smooth_step(x, u, dt)

    def rollout(us):
        def body(x, u):
            x1 = dyn(x, u)
            return x1, x1
        xh, xs = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)

    def total_cost(xs, us):
        ts = jnp.arange(h)
        cs = jax.vmap(stage)(xs[:-1], us, ts)
        return cs.sum() + term(xs[-1])

    fx = jax.vmap(jax.jacfwd(dyn, argnums=0))
    fu = jax.vmap(jax.jacfwd(dyn, argnums=1))
    cx = jax.vmap(jax.grad(stage, argnums=0))
    cu = jax.vmap(jax.grad(stage, argnums=1))
    cxx = jax.vmap(jax.hessian(stage, argnums=0))
    cuu = jax.vmap(jax.hessian(stage, argnums=1))

    def iteration(carry, _):
        us, best_cost = carry
        xs = rollout(us)
        ts = jnp.arange(h)

        F = fx(xs[:-1], us)                      # [H,3,3]
        L = fu(xs[:-1], us)                      # [H,3,2]
        c = jax.vmap(dyn)(xs[:-1], us) - (
            jnp.einsum("hij,hj->hi", F, xs[:-1])
            + jnp.einsum("hij,hj->hi", L, us))
        Q = cxx(xs[:-1], us, ts)
        # Gauss-Newton PSD projection: symmetrize + eigenvalue floor
        Q = 0.5 * (Q + Q.swapaxes(-1, -2))
        wq, vq = jnp.linalg.eigh(Q)
        Q = jnp.einsum("hij,hj,hkj->hik", vq, jnp.maximum(wq, 0.0), vq)
        q = cx(xs[:-1], us, ts) - jnp.einsum("hij,hj->hi", Q, xs[:-1])
        R = cuu(xs[:-1], us, ts)
        R = 0.5 * (R + R.swapaxes(-1, -2)) + cfg.mu * jnp.eye(m)
        wr, vr = jnp.linalg.eigh(R)
        R = jnp.einsum("hij,hj,hkj->hik", vr, jnp.maximum(wr, cfg.mu), vr)
        r = cu(xs[:-1], us, ts) - jnp.einsum("hij,hj->hi", R, us)
        QT = jax.hessian(term)(xs[-1])
        QT = 0.5 * (QT + QT.T)
        wt, vt = jnp.linalg.eigh(QT)
        QT = vt @ jnp.diag(jnp.maximum(wt, 0.0)) @ vt.T
        qT = jax.grad(term)(xs[-1]) - QT @ xs[-1]

        p = LqtProblem(F=F, L=L, c=c, Q=Q, q=q, R=R, r=r, QT=QT, qT=qT)
        _, _, K, d = lqt_backward_assoc(p)

        def try_alpha(alpha):
            # The LQT solution is the absolute affine policy u = -K x - d
            # (state-feedback included); line-search by blending the old
            # open-loop controls toward that policy evaluated closed-loop.
            def body(x, xs_):
                uref, Kk, dk = xs_
                u_lqr = -Kk @ x - dk
                u = jnp.clip(uref + alpha * (u_lqr - uref), lo, hi)
                x1 = dyn(x, u)
                return x1, (x1, u)
            _, (xs_new, us_new) = jax.lax.scan(body, x0, (us, K, d))
            xs_full = jnp.concatenate([x0[None], xs_new], axis=0)
            return total_cost(xs_full, us_new), us_new

        costs, us_cands = jax.vmap(try_alpha)(jnp.asarray(cfg.alphas))
        best = jnp.argmin(costs)
        improved = costs[best] < best_cost
        us_next = jnp.where(improved, us_cands[best], us)
        return (us_next, jnp.minimum(costs[best], best_cost)), costs[best]

    xs0 = rollout(us_init)
    c0 = total_cost(xs0, us_init)
    (us, cost), _ = jax.lax.scan(iteration, (us_init, c0), None,
                                 length=cfg.iters)
    xs = rollout(us)
    return us, xs, cost


def batched_ilqr(x0s, goals, us_inits, wc: WorldCost,
                 ped_traj, ped_r,
                 cfg: IlqrConfig, w8: CostWeights = CostWeights(),
                 dt: float = 0.4, robot_traj=None, robot_r=None):
    """vmap over robots sharing a world (and one ped prediction).

    robot_traj [H,N,2] / robot_r [N]: other-robot avoidance tracks, each
    robot's own column self-masked (see batched_mppi)."""
    n = x0s.shape[0]
    if ped_traj.ndim == 2:
        ped_traj = jnp.broadcast_to(ped_traj[None],
                                    (cfg.horizon,) + ped_traj.shape)

    def one(i, x0, g, u0):
        if robot_traj is not None:
            far = jnp.full((robot_traj.shape[0], 2), 1e6)
            others = robot_traj.at[:, i, :].set(far)
            avoid_traj = jnp.concatenate([ped_traj, others], axis=1)
            avoid_r = jnp.concatenate([ped_r, robot_r])
        else:
            avoid_traj, avoid_r = ped_traj, ped_r
        return ilqr_solve(x0, g, u0, wc, avoid_traj, avoid_r, cfg, w8, dt)

    return jax.vmap(one)(jnp.arange(n), x0s, goals, us_inits)
