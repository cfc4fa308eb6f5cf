"""Probit denoiser and covariate-solver tests."""

import jax.numpy as jnp
import numpy as np
from scipy.special import ndtr
from scipy.stats import norm

from vampomi_tpu.glm.probit import (
    g1_bin_class, g1d_bin_class, mlogl_probit, newton_method_cov, predict_probit,
)


def numeric_posterior_mean(p, tau1, y, m_cov=0.0, probit_var=1.0):
    """E[z | p, y] by dense quadrature: posterior ∝ N(z; p, 1/tau1) ·
    Phi((2y-1)(z + m_cov)/sqrt(probit_var))."""
    sd = np.sqrt(1.0 / tau1)
    z = np.linspace(p - 12 * sd, p + 12 * sd, 200001)
    w = norm.pdf(z, loc=p, scale=sd) * ndtr((2 * y - 1) * (z + m_cov) / np.sqrt(probit_var))
    return np.trapezoid(w * z, z) / np.trapezoid(w, z)


def test_g1_bin_class_matches_quadrature():
    for p, tau1, y, mc in [(0.3, 2.0, 1.0, 0.0), (-1.2, 0.7, 0.0, 0.5),
                           (2.5, 5.0, 1.0, -0.3), (0.0, 1.0, 0.0, 0.0)]:
        got = float(g1_bin_class(jnp.asarray(p), tau1, jnp.asarray(y), mc))
        want = numeric_posterior_mean(p, tau1, y, mc)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_g1_bin_class_extreme_args_stable():
    """Very negative sign*c would overflow a naive phi/Phi; log_ndtr keeps it
    finite (the reference needed a custom erfcx for this)."""
    p = jnp.asarray([-30.0, 30.0, -8.0, 8.0])
    y = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    out = np.asarray(g1_bin_class(p, 1.0, y))
    assert np.all(np.isfinite(out))
    d = np.asarray(g1d_bin_class(p, 1.0, y))
    assert np.all(np.isfinite(d))


def test_g1d_is_derivative():
    eps = 1e-5
    for p, tau1, y in [(0.4, 2.0, 1.0), (-0.9, 0.5, 0.0)]:
        f2 = float(g1_bin_class(jnp.asarray(p + eps), tau1, jnp.asarray(y)))
        f1 = float(g1_bin_class(jnp.asarray(p - eps), tau1, jnp.asarray(y)))
        # reference derivative convention: g1d = tau1 * Var = 1 - ratio(...)
        # and dg1/dp = g1d (posterior-mean derivative)
        got = float(g1d_bin_class(jnp.asarray(p), tau1, jnp.asarray(y)))
        np.testing.assert_allclose(got, (f2 - f1) / (2 * eps), rtol=1e-4)


def test_newton_recovers_probit_coefficients():
    rng = np.random.default_rng(3)
    n, c = 4000, 3
    Z = rng.normal(size=(n, c))
    eta_true = np.array([0.8, -0.5, 0.3])
    y = (Z @ eta_true + rng.normal(size=n) > 0).astype(float)
    eta = newton_method_cov(y, np.zeros(n), Z, np.zeros(c))
    np.testing.assert_allclose(eta, eta_true, atol=0.12)
    # solution should (near-)minimize the negative log-likelihood
    base = mlogl_probit(y, np.zeros(n), 1.0, Z, eta)
    for delta in np.eye(c) * 0.05:
        assert mlogl_probit(y, np.zeros(n), 1.0, Z, eta + delta) >= base - 1e-9


def test_predict_probit_threshold():
    z = np.array([-2.0, -0.1, 0.0, 0.1, 2.0])
    np.testing.assert_array_equal(predict_probit(z, 0.5), [0, 0, 1, 1, 1])
