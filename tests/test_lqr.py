"""LQT Riccati: sequential vs parallel-scan vs brute-force optimum."""

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.mpc.lqr import (
    LqtProblem,
    lqt_backward_assoc,
    lqt_backward_seq,
    lqt_rollout,
)


def random_problem(rng, h=9, n=3, m=2):
    def psd(k):
        a = rng.normal(size=(k, k))
        return a @ a.T + k * np.eye(k)

    F = rng.normal(size=(h, n, n)) * 0.4 + np.eye(n)
    L = rng.normal(size=(h, n, m))
    c = rng.normal(size=(h, n)) * 0.1
    Q = np.stack([psd(n) * 0.1 for _ in range(h)])
    q = rng.normal(size=(h, n)) * 0.1
    R = np.stack([psd(m) for _ in range(h)])
    r = rng.normal(size=(h, m)) * 0.1
    QT = psd(n)
    qT = rng.normal(size=(n,))
    return LqtProblem(*[jnp.asarray(x) for x in (F, L, c, Q, q, R, r, QT, qT)])


def total_cost(p, xs, us):
    c = 0.0
    h = p.F.shape[0]
    for k in range(h):
        x, u = np.asarray(xs[k]), np.asarray(us[k])
        c += 0.5 * x @ np.asarray(p.Q[k]) @ x + np.asarray(p.q[k]) @ x
        c += 0.5 * u @ np.asarray(p.R[k]) @ u + np.asarray(p.r[k]) @ u
    xh = np.asarray(xs[h])
    return c + 0.5 * xh @ np.asarray(p.QT) @ xh + np.asarray(p.qT) @ xh


def test_seq_matches_assoc(rng):
    p = random_problem(rng)
    S1, s1, K1, d1 = lqt_backward_seq(p)
    S2, s2, K2, d2 = lqt_backward_assoc(p)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-8, atol=1e-8)


def test_policy_is_optimal(rng):
    """Perturbing any control of the LQT rollout cannot reduce total cost."""
    p = random_problem(rng, h=6)
    _, _, K, d = lqt_backward_seq(p)
    x0 = jnp.asarray(rng.normal(size=(3,)))
    xs, us = lqt_rollout(p, x0, K, d)
    base = total_cost(p, xs, us)
    h = p.F.shape[0]
    for k in [0, h // 2, h - 1]:
        for j in range(2):
            for eps in (1e-3, -1e-3):
                us_p = np.asarray(us).copy()
                us_p[k, j] += eps
                # re-rollout open loop with perturbed controls
                x = np.asarray(x0)
                xs_p = [x]
                for t in range(h):
                    x = (np.asarray(p.F[t]) @ x + np.asarray(p.L[t]) @ us_p[t]
                         + np.asarray(p.c[t]))
                    xs_p.append(x)
                assert total_cost(p, np.asarray(xs_p), us_p) >= base - 1e-9


def test_value_function_quadratic(rng):
    """V_0 from (S_0, s_0) equals the realized optimal cost up to the constant:
    check via two different x0 differences."""
    p = random_problem(rng, h=5)
    S, s, K, d = lqt_backward_seq(p)
    x_a = jnp.asarray(rng.normal(size=(3,)))
    x_b = jnp.asarray(rng.normal(size=(3,)))

    def realized(x0):
        xs, us = lqt_rollout(p, x0, K, d)
        return total_cost(p, xs, us)

    def vfun(x0):
        x0 = np.asarray(x0)
        return 0.5 * x0 @ np.asarray(S[0]) @ x0 - np.asarray(s[0]) @ x0

    diff_real = realized(x_a) - realized(x_b)
    diff_v = vfun(x_a) - vfun(x_b)
    np.testing.assert_allclose(diff_real, diff_v, rtol=1e-7, atol=1e-7)


def test_assoc_long_horizon(rng):
    p = random_problem(rng, h=64)
    S1, s1, K1, d1 = lqt_backward_seq(p)
    S2, s2, K2, d2 = lqt_backward_assoc(p)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6, atol=1e-7)
