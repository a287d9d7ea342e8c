"""Time-varying LQR/LQT solvers: sequential Riccati and parallel-scan Riccati.

The backward Riccati recursion is the sequential bottleneck of iLQR — the
moral equivalent of sequence parallelism here (SURVEY.md §5).  We provide

  * ``lqt_backward_seq``  — classic reverse ``lax.scan`` recursion;
  * ``lqt_backward_assoc``— Särkkä & García-Fernández-style temporal
    parallelization: the per-step conditional value functions form a
    (min-plus) semigroup with elements (A, b, C, eta, J) combined by
    ``jax.lax.associative_scan`` in O(log H) depth.

Both return the value-function pairs (S_k, s_k) with
V_k(x) = 0.5 x'S_k x - s_k'x + const, from which the affine policy
u_k = -K_k x - d_k is recovered pointwise (vectorized over the horizon).

Problem form (k = 0..H-1):
    x_{k+1} = F_k x_k + L_k u_k + c_k
    cost    = sum_k 0.5 x'Q_k x + q_k'x + 0.5 u'R_k u + r_k'u
              + 0.5 x_H'Q_H x_H + q_H'x_H
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LqtProblem(NamedTuple):
    F: jnp.ndarray   # [H,n,n]
    L: jnp.ndarray   # [H,n,m]
    c: jnp.ndarray   # [H,n]
    Q: jnp.ndarray   # [H,n,n] state cost (stage)
    q: jnp.ndarray   # [H,n]
    R: jnp.ndarray   # [H,m,m]
    r: jnp.ndarray   # [H,m]
    QT: jnp.ndarray  # [n,n] terminal
    qT: jnp.ndarray  # [n]


def _solve_psd(mat, rhs):
    return jnp.linalg.solve(mat, rhs)


# ---------------------------------------------------------------------------
# Sequential backward pass
# ---------------------------------------------------------------------------


def lqt_backward_seq(p: LqtProblem):
    """Reverse scan Riccati. Returns (S [H+1,n,n], s [H+1,n])."""

    def body(carry, xs):
        S_next, s_next = carry
        F, L, c, Q, q, R, r = xs
        # u* = -(R + L'S'L)^{-1} (L'(S'(Fx + c) - s') + r)
        H_uu = R + L.T @ S_next @ L
        G = L.T @ S_next @ F                       # [m,n]
        h = L.T @ (S_next @ c - s_next) + r        # [m]
        K = _solve_psd(H_uu, G)
        d = _solve_psd(H_uu, h)
        Fc = F - L @ K
        S = Q + F.T @ S_next @ Fc
        s = -q + K.T @ r + Fc.T @ (s_next - S_next @ c)
        S = 0.5 * (S + S.T)
        return (S, s), (S, s, K, d)

    init = (p.QT, -p.qT)
    (_, _), (Ss, ss, Ks, ds) = jax.lax.scan(
        body, init, (p.F, p.L, p.c, p.Q, p.q, p.R, p.r), reverse=True)
    S_all = jnp.concatenate([Ss, p.QT[None]], axis=0)
    s_all = jnp.concatenate([ss, -p.qT[None]], axis=0)
    return S_all, s_all, Ks, ds


# ---------------------------------------------------------------------------
# Parallel (associative scan) backward pass
# ---------------------------------------------------------------------------


class _Elem(NamedTuple):
    A: jnp.ndarray
    b: jnp.ndarray
    C: jnp.ndarray
    eta: jnp.ndarray
    J: jnp.ndarray


def _combine(ej: _Elem, ei: _Elem) -> _Elem:
    """Compose conditional value functions: result spans ei's interval first.

    Operands arrive reversed (suffix scan runs on the reversed sequence), so
    ``ei`` is the earlier interval, ``ej`` the later one.
    """
    n = ei.A.shape[-1]
    I = jnp.eye(n, dtype=ei.A.dtype)
    D = I + ei.C @ ej.J                              # [n,n]
    Dinv_Ai = jnp.linalg.solve(D, ei.A)
    Dinv_b = jnp.linalg.solve(D, ei.b[..., None] + ei.C @ ej.eta[..., None])
    Dinv_C = jnp.linalg.solve(D, ei.C)
    Dt = I + ej.J @ ei.C
    Dt_inv_eta = jnp.linalg.solve(Dt, ej.eta[..., None] - ej.J @ ei.b[..., None])
    Dt_inv_J = jnp.linalg.solve(Dt, ej.J)
    A = ej.A @ Dinv_Ai
    b = (ej.A @ Dinv_b)[..., 0] + ej.b
    C = ej.A @ Dinv_C @ ej.A.swapaxes(-1, -2) + ej.C
    eta = (ei.A.swapaxes(-1, -2) @ Dt_inv_eta)[..., 0] + ei.eta
    J = ei.A.swapaxes(-1, -2) @ Dt_inv_J @ ei.A + ei.J
    return _Elem(A, b, C, eta, J)


def lqt_backward_assoc(p: LqtProblem):
    """O(log H)-depth Riccati via associative_scan.  Returns (S, s, K, d)
    identical (to fp tolerance) to ``lqt_backward_seq``."""
    h, n, m = p.F.shape[0], p.F.shape[1], p.L.shape[2]

    Rinv_Lt = jax.vmap(_solve_psd)(p.R, p.L.swapaxes(-1, -2))   # [H,m,n]
    Rinv_r = jax.vmap(_solve_psd)(p.R, p.r[..., None])[..., 0]  # [H,m]
    C = p.L @ Rinv_Lt                                            # [H,n,n]
    b = p.c - (p.L @ Rinv_r[..., None])[..., 0]
    elems = _Elem(A=p.F, b=b, C=C, eta=-p.q, J=p.Q)
    # terminal element
    zero_n = jnp.zeros((1, n, n))
    term = _Elem(
        A=jnp.zeros((1, n, n)), b=jnp.zeros((1, n)), C=zero_n,
        eta=-p.qT[None], J=p.QT[None],
    )
    seq = _Elem(*[jnp.concatenate([a, t], axis=0) for a, t in zip(elems, term)])
    rev = jax.tree_util.tree_map(lambda x: jnp.flip(x, 0), seq)
    scanned = jax.lax.associative_scan(_combine, rev)
    suff = jax.tree_util.tree_map(lambda x: jnp.flip(x, 0), scanned)
    S_all = suff.J          # [H+1,n,n]
    s_all = suff.eta        # [H+1,n]

    # recover gains pointwise from (S_{k+1}, s_{k+1})
    S1, s1 = S_all[1:], s_all[1:]
    H_uu = p.R + p.L.swapaxes(-1, -2) @ S1 @ p.L
    G = p.L.swapaxes(-1, -2) @ S1 @ p.F
    hvec = (p.L.swapaxes(-1, -2) @ (S1 @ p.c[..., None] - s1[..., None]))[..., 0] + p.r
    K = jax.vmap(_solve_psd)(H_uu, G)
    d = jax.vmap(_solve_psd)(H_uu, hvec[..., None])[..., 0]
    return S_all, s_all, K, d


def lqt_rollout(p: LqtProblem, x0, K, d):
    """Forward pass with the affine policy; returns (xs [H+1,n], us [H,m])."""

    def body(x, xs):
        F, L, c, Kk, dk = xs
        u = -Kk @ x - dk
        x1 = F @ x + L @ u + c
        return x1, (x1, u)

    xH, (xs, us) = jax.lax.scan(body, x0, (p.F, p.L, p.c, K, d))
    return jnp.concatenate([x0[None], xs], axis=0), us
