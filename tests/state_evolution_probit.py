"""Scalar state-evolution recursion for the probit (bin_class) GLM-VAMP —
independent of the reference implementation, like tests/state_evolution.py.

The four half-steps per iteration (SURVEY §3.5) have these large-system
scalar dynamics under the matched run (true prior, rho = 1, probit_var = 1):

  x-denoise:   alpha1 = gam1 * mmse_x(gam1)          [Stein identity — the
               x-denoiser is the Bayes posterior mean under the true prior]
               eta1 = gam1/alpha1, gam2 = eta1 - gam1
  z-denoise:   beta1 = E[ d/dp E_local[z | p, y] ]   over the TRUE joint
               p1 = z0 + N(0, 1/tau1), z0 ~ N(0, Vz), y = 1{z0 + eps > 0};
               E_local is the LOCAL channel posterior mean (prior N(p, 1/tau1),
               likelihood Phi((2y-1)z)) — evaluated by dense quadrature and
               differentiated by central differences, so no g1d_bin_class
               formula from the reference enters anywhere.
               tau2 = tau1 (1 - beta1)/beta1
  LMMSE x:     alpha2 = Marchenko-Pastur integral at (tau2, gam2)
               gam1' = gam2 (1 - alpha2)/alpha2
  LMMSE z:     beta2 = (Mt/N)(1 - alpha2), tau1' = tau2 (1 - beta2)/beta2

Vz = Var(z0) = sum_j beta_j^2 (internal units) = h2 for the data_sim
construction.  The outer expectations are 1-D Gauss-Hermite over the p1
marginal N(0, Vz + 1/tau1), with P(y | p1) in closed form from the Gaussian
convolution (first-principles Bayes, not reference code).
"""

from __future__ import annotations

import numpy as np
from scipy.special import ndtr
from scipy.stats import norm

from tests.state_evolution import lmmse_alpha2_complement_mp, posterior_mmse


def local_posterior_mean(p: float, tau1: float, y: float) -> float:
    """E[z | p, y] of the local z-channel: prior N(z; p, 1/tau1), likelihood
    Phi((2y-1) z) — dense quadrature (same oracle as test_glm_probit)."""
    sd = np.sqrt(1.0 / tau1)
    z = np.linspace(p - 12 * sd, p + 12 * sd, 20001)
    w = norm.pdf(z, loc=p, scale=sd) * ndtr((2 * y - 1) * z)
    return float(np.trapezoid(w * z, z) / np.trapezoid(w, z))


def z_stage_beta1(
    tau1: float, vz: float, n_nodes: int = 81, informative: bool = True
) -> float:
    """beta1 = E[g1d] over the true joint, via FD of the quadrature
    posterior mean.  P(y=1 | p1) = Phi( m_c / sqrt(v_c + 1) ) with
    (m_c, v_c) the posterior of z0 given p1 alone (prior N(0, vz), channel
    N(p1; z0, 1/tau1)) — plain Gaussian conjugacy + probit marginal.

    informative=False models iteration 1, where the engine initializes
    p1 ~ N(0, 1) INDEPENDENT of z0 (reference src/vamp_probit.cpp:53):
    the p1 marginal is N(0, 1) and y carries no information about p1."""
    if informative:
        var_p = vz + 1.0 / tau1
    else:
        var_p = 1.0
    nodes, weights = np.polynomial.hermite_e.hermegauss(n_nodes)
    total = 0.0
    for x, w in zip(nodes, weights):
        p1 = x * np.sqrt(var_p)
        if informative:
            v_c = 1.0 / (1.0 / vz + tau1)
            m_c = v_c * tau1 * p1
            py1 = ndtr(m_c / np.sqrt(v_c + 1.0))
        else:
            py1 = 0.5
        # FD step: small against the scale the derivative varies over (the
        # channel sd), large against the quadrature noise of E_local
        h = 1e-3 * max(1.0, np.sqrt(1.0 / tau1))
        for y, py in ((1.0, py1), (0.0, 1.0 - py1)):
            d = (local_posterior_mean(p1 + h, tau1, y)
                 - local_posterior_mean(p1 - h, tau1, y)) / (2 * h)
            total += w * py * d
    return float(total / np.sqrt(2 * np.pi))


def se_trajectory_probit(
    gam1_0: float,
    vz: float,
    probs,
    vars_internal,
    gamma: float,
    mt_over_n: float,
    iterations: int,
) -> list[dict]:
    """Matched probit GLM-VAMP state evolution.  Returns per-iteration
    records matching the engine's params CSV columns
    [alpha1, beta1, gam1, tau1, alpha2, beta2, gam2, tau2]."""
    gam1 = float(gam1_0)
    tau1 = float(gam1_0)  # reference init: tau1 = gam1 (vamp_probit.cpp:35)
    out = []
    for it in range(iterations):
        mmse = posterior_mmse(gam1, probs, vars_internal)
        alpha1 = gam1 * mmse
        eta1 = gam1 / alpha1
        gam2 = eta1 - gam1

        beta1 = z_stage_beta1(tau1, vz, informative=it > 0)
        tau2 = tau1 * (1.0 - beta1) / beta1

        comp = lmmse_alpha2_complement_mp(gam2, tau2, gamma)
        alpha2 = 1.0 - comp
        gam1_next = gam2 * comp / alpha2

        beta2 = mt_over_n * comp
        tau1_next = tau2 * (1.0 - beta2) / beta2

        out.append(dict(alpha1=alpha1, beta1=beta1, gam1=gam1, tau1=tau1,
                        alpha2=alpha2, beta2=beta2, gam2=gam2, tau2=tau2,
                        gam1_next=gam1_next, tau1_next=tau1_next))
        gam1 = gam1_next
        tau1 = tau1_next
    return out
