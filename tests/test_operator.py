"""Design-operator tests: fused standardization vs explicit matrices,
batched variants, padding exactness, and shard-count invariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from vampomi_tpu.ops.operator import (
    atx, atx_batch, ax, ax_batch, build_design, normal_eq_mult,
)


def explicit_A(X):
    """A = (X - 1 mu^T) diag(1/sd) / sqrt(N), column-standardized, (N, M)."""
    n = X.shape[0]
    mu = X.mean(axis=0)
    sd = np.sqrt(((X - mu) ** 2).sum(axis=0) / (n - 1))
    return (X - mu) / sd / np.sqrt(n)


@pytest.fixture(scope="module")
def problem(small_fixture):
    X = small_fixture.X  # (N, M)
    dm = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    return X, dm


def test_ax_matches_explicit(problem):
    X, dm = problem
    A = explicit_A(X)
    rng = np.random.default_rng(0)
    x = rng.normal(size=X.shape[1])
    np.testing.assert_allclose(np.asarray(ax(dm, jnp.asarray(x))), A @ x, rtol=1e-10)


def test_atx_matches_explicit(problem):
    X, dm = problem
    A = explicit_A(X)
    rng = np.random.default_rng(1)
    y = rng.normal(size=X.shape[0])
    np.testing.assert_allclose(np.asarray(atx(dm, jnp.asarray(y))), A.T @ y, rtol=1e-10)


def test_batch_variants_match_single(problem):
    X, dm = problem
    rng = np.random.default_rng(2)
    xs = rng.normal(size=(X.shape[1], 3))
    ys = rng.normal(size=(X.shape[0], 3))
    zb = np.asarray(ax_batch(dm, jnp.asarray(xs)))
    vb = np.asarray(atx_batch(dm, jnp.asarray(ys)))
    for k in range(3):
        np.testing.assert_allclose(zb[:, k], np.asarray(ax(dm, jnp.asarray(xs[:, k]))), rtol=1e-12)
        np.testing.assert_allclose(vb[:, k], np.asarray(atx(dm, jnp.asarray(ys[:, k]))), rtol=1e-12)


def test_normal_eq_mult(problem):
    X, dm = problem
    A = explicit_A(X)
    rng = np.random.default_rng(3)
    v = rng.normal(size=X.shape[1])
    tau, gam2 = 1.7, 0.3
    expect = tau * A.T @ (A @ v) + gam2 * v
    got = np.asarray(normal_eq_mult(dm, jnp.asarray(v), tau, gam2))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_alpha_scale(problem):
    X, _ = problem
    dm2 = build_design(X.T, mesh=None, compute_dtype=jnp.float64, alpha_scale=0.5)
    n = X.shape[0]
    mu = X.mean(axis=0)
    sd = np.sqrt(((X - mu) ** 2).sum(axis=0) / (n - 1))
    A = (X - mu) / np.sqrt(sd) / np.sqrt(n)  # 1/sd^0.5
    rng = np.random.default_rng(4)
    x = rng.normal(size=X.shape[1])
    np.testing.assert_allclose(np.asarray(ax(dm2, jnp.asarray(x))), A @ x, rtol=1e-9)


def test_padding_and_shard_invariance(small_fixture, mesh8):
    """Sharded over 8 CPU devices (with padding to a multiple of 8) must match
    the unsharded result — the analog of MPI rank-count invariance."""
    X = small_fixture.X  # M=500, not divisible by 8 -> forces padding
    dm_single = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    dm_shard = build_design(X.T, mesh=mesh8, compute_dtype=jnp.float64)
    assert dm_shard.m_pad % 8 == 0 and dm_shard.m_pad >= X.shape[1]

    rng = np.random.default_rng(5)
    x = rng.normal(size=X.shape[1])
    xp = np.zeros(dm_shard.m_pad)
    xp[: X.shape[1]] = x

    z_single = np.asarray(ax(dm_single, jnp.asarray(x)))
    z_shard = np.asarray(ax(dm_shard, jnp.asarray(xp)))
    np.testing.assert_allclose(z_shard, z_single, rtol=1e-12)

    y = rng.normal(size=X.shape[0])
    v_single = np.asarray(atx(dm_single, jnp.asarray(y)))
    v_shard = np.asarray(atx(dm_shard, jnp.asarray(y)))
    np.testing.assert_allclose(v_shard[: X.shape[1]], v_single, rtol=1e-12)
    assert np.all(v_shard[X.shape[1] :] == 0.0), "padded entries must be exact zeros"


def test_narrow_dtype_close(problem):
    X, dm64 = problem
    dm32 = build_design(X.T, mesh=None, compute_dtype=jnp.float32)
    rng = np.random.default_rng(6)
    x = rng.normal(size=X.shape[1])
    z64 = np.asarray(ax(dm64, jnp.asarray(x)))
    z32 = np.asarray(ax(dm32, jnp.asarray(x)))
    np.testing.assert_allclose(z32, z64, rtol=2e-4, atol=2e-4)
