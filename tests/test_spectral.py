"""Gram-space LMMSE solver tests: Gram exactness, Woodbury/Cholesky solve vs
dense f64, closed-form traces vs dense, CG agreement, engine convergence
parity, and shard-count invariance of the Gram build."""

import jax.numpy as jnp
import numpy as np
import pytest

from vampomi_tpu.config import RunConfig
from vampomi_tpu.engine.linear import choose_lmmse_solver, infere_linear
from vampomi_tpu.ops.cg import cg_solve
from vampomi_tpu.ops.operator import build_design
from vampomi_tpu.ops.spectral import (
    build_spectral, gram, spectral_solve, spectral_traces,
)

from tests.test_operator import explicit_A

PROBS3 = [0.9, 0.07, 0.03]
VARS3 = [0.0, 1e-3, 1e-2]


@pytest.fixture(scope="module")
def problem(small_fixture):
    X = small_fixture.X  # (N, M) sample-major
    dm = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    A = explicit_A(X)    # (N, M) dense standardized operator
    return A, dm


@pytest.fixture(scope="module")
def factor(problem):
    _, dm = problem
    return build_spectral(dm, block=128)  # small block to exercise the scan


def test_gram_matches_dense(problem):
    A, dm = problem
    K = np.asarray(gram(dm, block=128))
    np.testing.assert_allclose(K, A @ A.T, atol=1e-10)


def test_shift_cholesky_reconstructs(problem, factor):
    from vampomi_tpu.ops.spectral import shift_cholesky

    A, _ = problem
    tau, gam2 = 2.5, 0.7
    L = np.asarray(shift_cholesky(factor, tau, gam2))
    S = tau * (A @ A.T) + gam2 * np.eye(A.shape[0])
    np.testing.assert_allclose(L @ L.T, S, atol=1e-9)


def test_spectral_solve_exact(problem, factor):
    A, dm = problem
    rng = np.random.default_rng(0)
    m = A.shape[1]
    v = rng.normal(size=dm.m_pad)
    for tau, gam2 in [(2.0, 0.5), (17.3, 1e-3), (0.3, 40.0)]:
        Q = tau * A.T @ A + gam2 * np.eye(m)
        mu_dense = np.linalg.solve(Q, v[:m])
        mu, z_mu = spectral_solve(dm, factor, jnp.asarray(v), tau, gam2)
        np.testing.assert_allclose(np.asarray(mu)[:m], mu_dense, rtol=1e-8, atol=1e-10)
        # padded coordinates see Q = gam2 I exactly
        np.testing.assert_allclose(np.asarray(mu)[m:], v[m:] / gam2, rtol=1e-12)
        # algebraic z_mu really is A mu
        np.testing.assert_allclose(np.asarray(z_mu), A @ mu_dense, rtol=1e-7, atol=1e-9)


def test_traces_exact(problem, factor):
    A, dm = problem
    m = A.shape[1]
    AtA = A.T @ A
    for tau, gam2 in [(2.0, 0.5), (17.3, 1e-3)]:
        Qinv = np.linalg.inv(tau * AtA + gam2 * np.eye(m))
        tr_q, tr_ata = spectral_traces(factor, float(m), tau, gam2)
        np.testing.assert_allclose(float(tr_q), np.trace(Qinv), rtol=1e-8)
        np.testing.assert_allclose(float(tr_ata), np.trace(AtA @ Qinv), rtol=1e-8)


def test_matches_cg_solution(problem, factor):
    """Spectral and CG solve the same system to their respective tolerances."""
    _, dm = problem
    rng = np.random.default_rng(3)
    v = rng.normal(size=dm.m_pad)
    tau, gam2 = 3.1, 0.7
    mu_s, _ = spectral_solve(dm, factor, jnp.asarray(v), tau, gam2)
    res = cg_solve(dm, jnp.asarray(v), jnp.zeros(dm.m_pad), tau, gam2,
                   max_iter=500, tol=1e-10)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(res.mu[:, 0]),
                               rtol=1e-6, atol=1e-9)


def test_wide_matrix_mt_less_than_n():
    """Trace identities hold when Mt < N (rank-deficient Gram)."""
    rng = np.random.default_rng(5)
    n, m = 60, 25
    X = rng.normal(size=(m, n))
    dm = build_design(X, mesh=None, compute_dtype=jnp.float64)
    fac = build_spectral(dm)
    A = explicit_A(X.T)
    AtA = A.T @ A
    tau, gam2 = 1.7, 0.9
    Qinv = np.linalg.inv(tau * AtA + gam2 * np.eye(m))
    tr_q, tr_ata = spectral_traces(fac, float(m), tau, gam2)
    np.testing.assert_allclose(float(tr_q), np.trace(Qinv), rtol=1e-8)
    np.testing.assert_allclose(float(tr_ata), np.trace(AtA @ Qinv), rtol=1e-8)


def test_gram_shard_invariance(small_fixture, mesh8):
    X = small_fixture.X
    dm1 = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    dm8 = build_design(X.T, mesh=mesh8, compute_dtype=jnp.float64)
    K1 = np.asarray(gram(dm1, block=64))
    K8 = np.asarray(gram(dm8, block=64))
    np.testing.assert_allclose(K8, K1, atol=1e-11)


def test_engine_spectral_converges(small_fixture, tmp_path):
    """The spectral engine recovers the signal like the CG engine does, and
    its exact alpha2 stays within Monte-Carlo range of the probe estimate."""
    fx = small_fixture
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    common = dict(
        out_dir=str(tmp_path), out_name="s", iterations=8, rho=0.5, h2=0.8,
        gam1=1e-6, probs=list(PROBS3), vars=list(VARS3),
        stop_criteria_thr=1e-8, seed=7, trace=0,
    )
    res_s = infere_linear(dm, fx.y, RunConfig(lmmse_solver="spectral", **common),
                          true_signal=fx.beta, write_outputs=False)
    res_c = infere_linear(dm, fx.y, RunConfig(lmmse_solver="cg", **common),
                          true_signal=fx.beta, write_outputs=False)

    corr_s = np.corrcoef(res_s.x1_hat_scaled, fx.beta)[0, 1]
    corr_c = np.corrcoef(res_c.x1_hat_scaled, fx.beta)[0, 1]
    assert corr_s > 0.75
    assert abs(corr_s - corr_c) < 0.05
    # gamw estimates the same noise precision (1/(1-h2) scale)
    assert abs(res_s.gamw - res_c.gamw) / res_c.gamw < 0.2


def test_probit_spectral_converges(tmp_path):
    """Probit engine with the spectral solver matches the CG engine's
    classification quality (tau2 varies per iteration; factor is reused)."""
    from vampomi_tpu.engine.probit import infere_bin_class
    from vampomi_tpu.sim.data_sim import simulate_iid

    fx = simulate_iid(n=400, m=300, lam=0.15, h2=0.9, seed=9)
    rng = np.random.default_rng(10)
    ybin = (fx.X @ fx.beta + rng.normal(0, np.sqrt(0.1), fx.X.shape[0]) > 0).astype(float)
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    common = dict(
        out_dir=str(tmp_path), out_name="pb", model="bin_class", iterations=6,
        rho=0.3, gam1=1e-2, probs=[0.85, 0.1, 0.05], vars=[0.0, 1e-3, 1e-2],
        stop_criteria_thr=1e-8, seed=3, trace=0,
    )
    res_s = infere_bin_class(dm, ybin, RunConfig(lmmse_solver="spectral", **common),
                             true_signal=fx.beta, write_outputs=False)
    res_c = infere_bin_class(dm, ybin, RunConfig(lmmse_solver="cg", **common),
                             true_signal=fx.beta, write_outputs=False)
    acc_s, acc_c = res_s.metrics_history[-1][4], res_c.metrics_history[-1][4]
    assert acc_s > 0.75
    assert abs(acc_s - acc_c) < 0.05


def test_em_stability_warning(capsys):
    """EM on at M/N >= 16 — the regime EM_STABILITY.json measures as
    collapsing — must produce the one-line warning pointing at the
    --init-conf warm-start remedy; EM off or narrow M/N must not."""
    from vampomi_tpu.engine.linear import warn_em_stability

    cfg = RunConfig()  # learn_vars defaults to 1 (reference options.hpp)
    assert warn_em_stability(cfg, mt=1_000_000, n=10_000)
    assert "--init-conf" in capsys.readouterr().err
    assert not warn_em_stability(cfg, mt=10_000, n=10_000)
    assert not warn_em_stability(cfg.replace(learn_vars=0),
                                 mt=1_000_000, n=10_000)
    assert capsys.readouterr().err == ""


def test_auto_solver_choice(tmp_path):
    cfg = RunConfig()
    assert choose_lmmse_solver(cfg, mt=2000, n=300) == "cg"          # tiny N
    assert choose_lmmse_solver(cfg, mt=1_000_000, n=10_000) == "spectral"
    assert choose_lmmse_solver(cfg, mt=20_000, n=10_000) == "cg"     # Mt < 4N
    assert choose_lmmse_solver(cfg, mt=1_000_000, n=32_768) == "cg"  # N too big
    assert choose_lmmse_solver(cfg.replace(lmmse_solver="spectral"), 10, 10) == "spectral"

    # multi-chip auto with NO warm cache picks spectral (round-3 review,
    # Weak #2: a cold mesh run must not pay the ~20-min remote-compile
    # eigen build before iteration 1)
    assert choose_lmmse_solver(cfg, mt=1_000_000, n=10_000,
                               n_devices=8) == "spectral"
    missing = str(tmp_path / "nope.npz")
    assert choose_lmmse_solver(cfg.replace(eigen_cache=missing),
                               mt=1_000_000, n=10_000,
                               n_devices=8) == "spectral"
    # ...a corrupt cache file must not flip it either
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    assert choose_lmmse_solver(cfg.replace(eigen_cache=str(bad)),
                               mt=1_000_000, n=10_000,
                               n_devices=8) == "spectral"
    # ...while a warm plausible cache upgrades both 1-chip and mesh auto
    warm = tmp_path / "warm.npz"
    np.savez(warm, n=np.asarray(10_000))
    for nd in (1, 8):
        assert choose_lmmse_solver(cfg.replace(eigen_cache=str(warm)),
                                   mt=1_000_000, n=10_000,
                                   n_devices=nd) == "eigen"


def test_spectral_solve_extreme_shifts(problem, factor):
    """Clamp-boundary shifts (reference gamma clamps 1e-11..1e11,
    src/vamp.hpp:33-34) stay finite with errors bounded by the conditioning
    — at cond(Q) ~ 1e12+ NO solver (dense LU, the reference's CG, or this
    one) is pointwise accurate, so assert the achievable: finite outputs
    and a residual consistent with eps * cond(S)."""
    A, dm = problem
    rng = np.random.default_rng(8)
    m = A.shape[1]
    v = rng.normal(size=dm.m_pad)
    lam_max = np.linalg.eigvalsh(A @ A.T).max()
    for tau, gam2 in [(1e4, 1e-8), (1e-6, 1e4), (1.0, 1e-11)]:
        Q = tau * A.T @ A + gam2 * np.eye(m)
        mu, _ = spectral_solve(dm, factor, jnp.asarray(v), tau, gam2)
        mu = np.asarray(mu)
        assert np.all(np.isfinite(mu))
        resid = np.linalg.norm(Q @ mu[:m] - v[:m]) / np.linalg.norm(v[:m])
        cond_s = (tau * lam_max + gam2) / gam2
        assert resid < max(1e-10, 1e-12 * cond_s), (tau, gam2, resid)
        # traces vs dense inverse — both sides carry O(eps * cond) error at
        # the clamp boundary, so compare at a conditioning-aware tolerance
        tr_q, tr_ata = spectral_traces(factor, float(m), tau, gam2)
        Qinv = np.linalg.inv(Q)
        tol = max(1e-6, 1e-14 * cond_s)
        np.testing.assert_allclose(float(tr_q), np.trace(Qinv), rtol=tol)
        # tr_ata = (N - gam2 T)/tau cancels two ~N-sized terms when tau is
        # tiny; its tolerance carries the extra N/(tau tr) amplification
        tol_ata = max(tol, 1e-15 * m * gam2 / (tau * abs(float(tr_ata)) + 1e-300))
        np.testing.assert_allclose(float(tr_ata), np.trace(A.T @ A @ Qinv), rtol=tol_ata)


def test_blocked_cholesky_matches_lapack():
    from vampomi_tpu.ops.spectral import _blocked_cholesky

    rng = np.random.default_rng(13)
    for n, nb in [(100, 4), (257, 8), (512, 3)]:
        Kh = rng.normal(size=(n, n))
        S = Kh @ Kh.T / n + 5.0 * np.eye(n)
        L = np.asarray(_blocked_cholesky(jnp.asarray(S), nb))
        np.testing.assert_allclose(np.tril(L), np.linalg.cholesky(S),
                                   rtol=1e-10, atol=1e-12)


def test_traces_tiny_n_more_blocks_than_rows():
    """trace_blocks > N must degrade gracefully (forced spectral on a tiny
    problem bypasses the auto-solver guard)."""
    from vampomi_tpu.ops.spectral import GramFactor

    K = jnp.eye(4, dtype=jnp.float64) * 2.0
    tr_q, tr_ata = spectral_traces(GramFactor(K=K), 10.0, 1.0, 1.0)
    # S = I + 2I = 3I: tr S^-1 = 4/3; tr Q^-1 = 4/3 + (10-4)/1
    np.testing.assert_allclose(float(tr_q), 4.0 / 3.0 + 6.0, rtol=1e-12)
    np.testing.assert_allclose(float(tr_ata), (4.0 - 4.0 / 3.0) / 1.0, rtol=1e-12)


def test_shift_inverse_fused(problem, factor):
    """The fused factor+inverse+trace pass (shift_inverse) agrees with the
    direct dense forms for several shifts and block counts, including nb
    values that do not divide N."""
    from vampomi_tpu.ops.spectral import shift_inverse

    A, dm = problem
    n = A.shape[0]
    S_of = lambda tau, gam2: tau * (A @ A.T) + gam2 * np.eye(n)
    rng = np.random.default_rng(3)
    b = rng.normal(size=n)
    for tau, gam2 in [(2.5, 0.7), (17.3, 1e-3), (0.3, 40.0)]:
        S = S_of(tau, gam2)
        Sinv = np.linalg.inv(S)
        for nb in (1, 7, 8):
            wi = shift_inverse(factor, tau, gam2, nb=nb)
            W = np.asarray(wi.W)
            # W is the exact inverse Cholesky factor: W S W^T = I
            np.testing.assert_allclose(W @ S @ W.T, np.eye(n), atol=1e-8)
            np.testing.assert_allclose(float(wi.T), np.trace(Sinv), rtol=1e-10)
            # solve path: W^T W b == S^{-1} b
            np.testing.assert_allclose(
                np.asarray(wi.solve(jnp.asarray(b))), Sinv @ b, atol=1e-8
            )


def test_shift_inverse_nonpow2_recursion_blocks():
    """shift_inverse at block sizes ABOVE the _FACTOR_BASE leaf threshold
    with non-power-of-two N — the exact configuration a production
    N=10240/12288 factor uses (default_nb(10240)=16 -> 640-wide diagonal
    blocks running the lane-aligned 2x2 recursion of _factor_diag).  The
    N=300 fixture above never leaves the direct-cholesky leaf path."""
    from vampomi_tpu.ops.spectral import GramFactor, _FACTOR_BASE, shift_inverse

    rng = np.random.default_rng(9)
    for n, nb in ((640, 1), (1344, 2), (1920, 3)):
        assert n // nb > _FACTOR_BASE  # recursion actually exercised
        A = rng.standard_normal((n, 2 * n)) / np.sqrt(2 * n)
        K = A @ A.T
        fac = GramFactor(K=jnp.asarray(K))
        tau, gam2 = 5.0, 0.3
        S = tau * K + gam2 * np.eye(n)
        Sinv = np.linalg.inv(S)
        wi = shift_inverse(fac, tau, gam2, nb=nb)
        W = np.asarray(wi.W)
        np.testing.assert_allclose(W @ S @ W.T, np.eye(n), atol=1e-8)
        np.testing.assert_allclose(float(wi.T), np.trace(Sinv), rtol=1e-10)
        b = rng.standard_normal(n)
        np.testing.assert_allclose(
            np.asarray(wi.solve(jnp.asarray(b))), Sinv @ b, atol=1e-8)


def test_shift_inverse_matches_trace_pass(problem, factor):
    """Fused-trace == the independent blocked-forward-substitution trace."""
    from vampomi_tpu.ops.spectral import shift_inverse

    _, dm = problem
    tau, gam2 = 3.7, 0.11
    wi = shift_inverse(factor, tau, gam2, nb=8)
    t1 = spectral_traces(factor, dm.mt, tau, gam2, winv=wi)
    t2 = spectral_traces(factor, dm.mt, tau, gam2)  # L-based fwd-sub path
    np.testing.assert_allclose(float(t1[0]), float(t2[0]), rtol=1e-9)
    np.testing.assert_allclose(float(t1[1]), float(t2[1]), rtol=1e-9)


def test_gram_bf16_accuracy(small_fixture):
    """bf16 X takes the single-pass bf16-MXU gram route; K must agree with
    the f64 gram to the CLT-averaged weight-rounding level (~1e-3 at this
    tiny M; shrinks as 1/sqrt(M) at production scale)."""
    X = small_fixture.X
    dm64 = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    dm16 = build_design(X.T, mesh=None, compute_dtype=jnp.bfloat16)
    K64 = np.asarray(gram(dm64, block=128))
    K16 = np.asarray(gram(dm16, block=128), dtype=np.float64)
    scale = np.linalg.norm(K64)
    assert np.linalg.norm(K16 - K64) / scale < 2e-3
