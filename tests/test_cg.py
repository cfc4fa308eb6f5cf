"""CG solver tests: agreement with a dense solve, multi-RHS == single-RHS,
warm starting, and the Onsager early-exit variant."""

import jax.numpy as jnp
import numpy as np

from vampomi_tpu.ops.cg import cg_solve
from vampomi_tpu.ops.operator import build_design

from tests.test_operator import explicit_A


def make_problem(n=120, m=80, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, m))
    dm = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    A = explicit_A(X)
    return dm, A, rng


def test_cg_matches_dense_solve():
    dm, A, rng = make_problem()
    tau, gam2 = 2.0, 0.7
    Q = tau * A.T @ A + gam2 * np.eye(A.shape[1])
    v = rng.normal(size=A.shape[1])
    res = cg_solve(dm, jnp.asarray(v), jnp.zeros(A.shape[1]), tau, gam2,
                   max_iter=500, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.mu)[:, 0], np.linalg.solve(Q, v), rtol=1e-8)


def test_multirhs_equals_single():
    dm, A, rng = make_problem(seed=1)
    tau, gam2 = 1.3, 0.4
    m = A.shape[1]
    v1 = rng.normal(size=m)
    v2 = rng.normal(size=m)
    V = jnp.stack([jnp.asarray(v1), jnp.asarray(v2)], axis=1)
    both = cg_solve(dm, V, jnp.zeros((m, 2)), tau, gam2, max_iter=300, tol=1e-7)
    one = cg_solve(dm, jnp.asarray(v1), jnp.zeros(m), tau, gam2, max_iter=300, tol=1e-7)
    two = cg_solve(dm, jnp.asarray(v2), jnp.zeros(m), tau, gam2, max_iter=300, tol=1e-7)
    # per-column trajectories are independent: multi-RHS must equal single-RHS
    np.testing.assert_allclose(np.asarray(both.mu)[:, 0], np.asarray(one.mu)[:, 0], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(both.mu)[:, 1], np.asarray(two.mu)[:, 0], rtol=1e-10)


def test_warm_start_converges_faster():
    dm, A, rng = make_problem(seed=2)
    tau, gam2 = 1.0, 0.5
    m = A.shape[1]
    v = rng.normal(size=m)
    cold = cg_solve(dm, jnp.asarray(v), jnp.zeros(m), tau, gam2, max_iter=500, tol=1e-9)
    warm = cg_solve(dm, jnp.asarray(v), cold.mu[:, 0], tau, gam2, max_iter=500, tol=1e-9)
    assert int(warm.iters) <= int(cold.iters)
    assert int(warm.iters) <= 2  # already at the solution


def test_onsager_early_exit_estimate():
    """The Onsager column must deliver gam2 * u^T Q^{-1} u ~ gam2/Mt * tr(Q^{-1})
    in expectation; with the exact probe it must match the dense quadratic."""
    dm, A, rng = make_problem(n=150, m=100, seed=3)
    m = A.shape[1]
    tau, gam2 = 1.1, 0.9
    Q = tau * A.T @ A + gam2 * np.eye(m)
    u = (rng.integers(0, 2, size=m) * 2 - 1) / np.sqrt(m)
    res = cg_solve(
        dm, jnp.asarray(u), jnp.zeros(m), tau, gam2,
        max_iter=500, tol=1e-10,
        onsager_cols=jnp.asarray([True]),
    )
    onsager = gam2 * float(np.dot(u, np.asarray(res.mu)[:, 0]))
    exact = gam2 * float(u @ np.linalg.solve(Q, u))
    assert abs(onsager - exact) / exact < 1e-6
