"""Scalar gVAMP state-evolution (SE) recursion — an oracle INDEPENDENT of the
reference implementation.

Unlike tests/reference_impl.py (a numpy re-derivation of src/vamp.cpp, which
would share any misreading of the C++), this module predicts the engine's
(alpha1, gam2, alpha2, gam1) trajectory from FIRST PRINCIPLES only:

  * the denoising stage uses the Bayes posterior variance of the scalar AWGN
    channel  r = x0 + N(0, 1/gam1),  x0 ~ spike + Gaussian mixture —
    computed by Gauss-Hermite quadrature directly from the prior density.
    No g1/g1d formulas appear anywhere: for the matched MMSE denoiser,
    E[g1'(r)] = gam1 * mmse(gam1) is the classical I-MMSE/Stein identity,
    so a misreading of the reference's g1d (src/vamp.cpp:465-492) in BOTH
    the engine and the numpy oracle would still diverge from this oracle.

  * the LMMSE stage uses the Marchenko-Pastur law: for an i.i.d. design the
    standardized operator A (N x M, entries ~ N(0, 1/N)) has Gram spectrum
    lambda(A A^T) -> MP(gamma)/gamma with gamma = N/M, so

      alpha2 = gam2/M * tr[(gamw A^T A + gam2 I_M)^-1]
             -> (1 - gamma) + gamma * gam2 * E_MP[ 1/(gamw*lam/gamma + gam2) ]

    evaluated by numerical integration of the MP density — again no code or
    identity from the reference enters.

The recursion itself is the standard VAMP state evolution (Rangan, Schniter,
Fletcher, "Vector Approximate Message Passing", IEEE Trans. IT 2019) in the
Bayes-matched regime: eta = gam/alpha, next gam = eta - gam at both stages.
Tracking holds for the engine run WITHOUT damping (rho = 1) and with the
prior initialized at the truth (EM then stays at the truth up to O(M^-1/2)
fluctuations — so a broken EM update breaks the tracking, which is the
point of the test).
"""

from __future__ import annotations

import numpy as np


def posterior_mmse(gam1: float, probs, vars_) -> float:
    """E_r[ Var(x0 | r) ] for x0 ~ sum_k probs[k] N(0, vars_[k]) observed
    through r = x0 + N(0, 1/gam1).  Pure Bayes + Gauss-Hermite quadrature.

    vars_ are in the engine's INTERNAL units (already scaled by N).
    """
    probs = np.asarray(probs, dtype=np.float64)
    vars_ = np.asarray(vars_, dtype=np.float64)
    s = 1.0 / gam1

    # Gauss-Hermite nodes for integrals over each marginal component
    # r | k ~ N(0, vars_k + s)
    nodes, weights = np.polynomial.hermite_e.hermegauss(201)

    def posterior_stats(r):
        # component posterior weights w_k(r) ∝ probs_k N(r; 0, vars_k + s),
        # log-domain for stability
        tot = vars_ + s
        logw = np.log(probs)[:, None] - 0.5 * np.log(tot)[:, None] \
            - 0.5 * (r[None, :] ** 2) / tot[:, None]
        logw -= logw.max(axis=0, keepdims=True)
        w = np.exp(logw)
        w /= w.sum(axis=0, keepdims=True)
        shrink = (vars_ / tot)[:, None]           # E[x0 | r, k] = shrink_k r
        mean_k = shrink * r[None, :]
        var_k = (vars_ * s / tot)[:, None]        # Var[x0 | r, k]
        mean = (w * mean_k).sum(axis=0)
        second = (w * (var_k + mean_k**2)).sum(axis=0)
        return second - mean**2                   # Var[x0 | r]

    # E_r[.] over the mixture marginal of r
    val = 0.0
    for k in range(len(probs)):
        if probs[k] <= 0:
            continue
        sd = np.sqrt(vars_[k] + s)
        val += probs[k] * np.dot(weights, posterior_stats(nodes * sd)) / np.sqrt(2 * np.pi)
    return float(val)


def lmmse_alpha2_complement_mp(
    gam2: float, gamw: float, gamma: float, npts: int = 20001
) -> float:
    """1 - alpha2 with alpha2 = gam2/M tr(Q^-1), Q = gamw A^T A + gam2 I_M,
    in the large-system limit for i.i.d. A with E[A_ij^2] = 1/N;
    gamma = N/M < 1.

    A^T A has (M - N) zero modes plus N eigenvalues distributed as
    lam = mu / gamma with mu ~ MP(gamma):  f(mu) = sqrt((b-mu)(mu-a)) /
    (2 pi gamma mu) on [a, b], a = (1-sqrt(gamma))^2, b = (1+sqrt(gamma))^2.

    Computed as the complement  1 - alpha2 = gamma E[ t / (t + gam2) ],
    t = gamw mu / gamma, which keeps full RELATIVE accuracy when
    gamw -> 0 drives alpha2 -> 1 (the probit cold start needs
    gam1' = gam2 (1-alpha2)/alpha2 to ~1% when 1-alpha2 ~ 1e-6)."""
    a = (1.0 - np.sqrt(gamma)) ** 2
    b = (1.0 + np.sqrt(gamma)) ** 2
    # open grid avoiding the integrable endpoint singularities
    mu = np.linspace(a, b, npts)[1:-1]
    f = np.sqrt(np.maximum((b - mu) * (mu - a), 0.0)) / (2.0 * np.pi * gamma * mu)
    t = gamw * mu / gamma
    g = t / (t + gam2)
    e_val = np.trapezoid(f * g, mu)
    # f integrates to 1 up to discretization; renormalize to kill O(h) error
    e_val /= np.trapezoid(f, mu)
    return float(gamma * e_val)


def lmmse_alpha2_mp(gam2: float, gamw: float, gamma: float, npts: int = 20001) -> float:
    """alpha2 (see lmmse_alpha2_complement_mp for the math and conditioning)."""
    return 1.0 - lmmse_alpha2_complement_mp(gam2, gamw, gamma, npts)


def se_trajectory(
    gam1_0: float,
    gamw: float,
    probs,
    vars_internal,
    gamma: float,
    iterations: int,
) -> list[dict]:
    """Run the matched-VAMP SE recursion; returns one record per iteration
    with the same meaning as the engine's params CSV columns."""
    gam1 = float(gam1_0)
    out = []
    for _ in range(iterations):
        mmse = posterior_mmse(gam1, probs, vars_internal)
        alpha1 = gam1 * mmse                     # Stein/I-MMSE identity
        eta1 = gam1 / alpha1
        gam2 = eta1 - gam1
        alpha2 = lmmse_alpha2_mp(gam2, gamw, gamma)
        eta2 = gam2 / alpha2
        gam1_next = eta2 - gam2
        out.append(dict(alpha1=alpha1, gam1=gam1, gam2=gam2,
                        alpha2=alpha2, gam1_next=gam1_next))
        gam1 = gam1_next
    return out
