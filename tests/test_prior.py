"""Mixture-prior tests: closed forms, finite differences, EM vs the numpy
oracle, and merge semantics."""

import jax.numpy as jnp
import numpy as np

from vampomi_tpu.prior.mixture import (
    MixturePrior, em_update, g1, g1d, init_prior, merge_components,
)

from tests.reference_impl import NumpyVampOracle


def make_prior(probs, vars_scaled):
    return MixturePrior(
        probs=jnp.asarray(probs),
        vars=jnp.asarray(vars_scaled),
        active=jnp.ones(len(probs), dtype=bool),
    )


def test_g1_single_gaussian_closed_form():
    """With a pure Gaussian prior N(0, v), the posterior mean under
    r = x + N(0, sigma) is r * v / (v + sigma)."""
    v, gam1 = 2.5, 4.0
    sigma = 1.0 / gam1
    prior = make_prior([1.0], [v])
    r = jnp.linspace(-3, 3, 41)
    expect = np.asarray(r) * v / (v + sigma)
    np.testing.assert_allclose(np.asarray(g1(r, gam1, prior)), expect, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g1d(r, gam1, prior)), np.full(41, v / (v + sigma)), rtol=1e-10
    )


def test_g1d_is_derivative_of_g1():
    probs = [0.8, 0.15, 0.05]
    vars_ = [0.0, 0.5, 3.0]
    prior = make_prior(probs, vars_)
    gam1 = 2.0
    r = jnp.linspace(-4, 4, 31)
    eps = 1e-6
    fd = (np.asarray(g1(r + eps, gam1, prior)) - np.asarray(g1(r - eps, gam1, prior))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g1d(r, gam1, prior)), fd, rtol=1e-5, atol=1e-7)


def test_g1_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 30))
    y = rng.normal(size=50)
    probs = [0.7, 0.2, 0.1]
    vars_u = [0.0, 1e-3, 1e-2]
    o = NumpyVampOracle(X, y, probs, vars_u, gam1=3.0, h2=0.5, rho=0.5)
    prior = make_prior(probs, [v * 50 for v in vars_u])
    r1 = rng.normal(size=30)
    np.testing.assert_allclose(
        np.asarray(g1(jnp.asarray(r1), 3.0, prior)), o.g1(r1), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g1d(jnp.asarray(r1), 3.0, prior)), o.g1d(r1), rtol=1e-10
    )


def test_em_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    M = 200
    X = rng.normal(size=(50, M))
    y = rng.normal(size=50)
    probs = [0.9, 0.06, 0.04]
    vars_u = [0.0, 1e-3, 1e-1]
    gam1 = 2.0

    o = NumpyVampOracle(
        X, y, probs, vars_u, gam1=gam1, h2=0.5, rho=0.5,
        em_max_iter=3, em_err_thr=1e-12, learn_vars=1, merge_vars_thr=0.0,
    )
    r1 = rng.normal(size=M) * 0.5
    o.update_prior(r1)

    prior = init_prior(probs, vars_u, 50)
    mmask = jnp.ones(M)
    new = em_update(
        jnp.asarray(r1), gam1, prior, mmask, float(M),
        em_max_iter=3, em_err_thr=1e-12, learn_vars=True,
    )
    np.testing.assert_allclose(np.asarray(new.probs), o.probs, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(new.vars), o.vars, rtol=1e-9)


def test_em_respects_padding_mask():
    rng = np.random.default_rng(2)
    M = 100
    r1 = rng.normal(size=M)
    probs = [0.9, 0.1]
    vars_u = [0.0, 1e-2]
    prior = init_prior(probs, vars_u, 50)

    # same markers + 28 padded slots (r1 = 0 there) must give identical EM
    r1_pad = np.zeros(M + 28)
    r1_pad[:M] = r1
    mask = np.zeros(M + 28)
    mask[:M] = 1.0

    a = em_update(jnp.asarray(r1), 2.0, prior, jnp.ones(M), float(M),
                  em_max_iter=2, em_err_thr=1e-12, learn_vars=True)
    b = em_update(jnp.asarray(r1_pad), 2.0, prior, jnp.asarray(mask), float(M),
                  em_max_iter=2, em_err_thr=1e-12, learn_vars=True)
    np.testing.assert_allclose(np.asarray(a.probs), np.asarray(b.probs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.vars), np.asarray(b.vars), rtol=1e-12)


def test_merge_components_semantics():
    # vars 1.0 and 1.2 are within 50% of min -> merge (sum probs into first)
    probs = np.array([0.5, 0.3, 0.2])
    vars_ = np.array([0.0, 1.0, 1.2])
    active = np.ones(3, dtype=bool)
    p, v, a = merge_components(probs, vars_, active, merge_vars_thr=0.5)
    assert a.tolist() == [True, True, False]
    np.testing.assert_allclose(p, [0.5, 0.5, 0.0])

    # spike (var 0) uses denom 1e-7 -> only merges truly tiny vars
    probs = np.array([0.5, 0.5])
    vars_ = np.array([0.0, 1e-9])
    p, v, a = merge_components(probs, vars_, np.ones(2, dtype=bool), 0.5)
    assert a.tolist() == [True, False]  # |0 - 1e-9| / 1e-7 = 0.01 < 0.5


def test_g1_ignores_inactive_components():
    active_prior = make_prior([0.7, 0.3], [0.0, 2.0])
    masked = MixturePrior(
        probs=jnp.asarray([0.7, 0.3, 0.0]),
        vars=jnp.asarray([0.0, 2.0, 999.0]),  # huge dead slot must not leak
        active=jnp.asarray([True, True, False]),
    )
    r = jnp.linspace(-2, 2, 11)
    np.testing.assert_allclose(
        np.asarray(g1(r, 1.5, masked)), np.asarray(g1(r, 1.5, active_prior)), rtol=1e-12
    )


def test_merge_device_matches_host():
    import jax.numpy as jnp

    from vampomi_tpu.prior.mixture import (
        MixturePrior, merge_components, merge_components_device,
    )

    rng = np.random.default_rng(11)
    for _ in range(20):
        L = 8
        probs = rng.dirichlet(np.ones(L))
        vars_ = np.sort(rng.uniform(0, 1.0, L)) * rng.choice([0.0, 1.0], L, p=[0.2, 0.8])
        active = rng.uniform(size=L) < 0.9
        thr = rng.uniform(0.05, 0.8)
        ph, vh, ah = merge_components(probs, vars_, active, thr)
        pd = merge_components_device(
            MixturePrior(jnp.asarray(probs), jnp.asarray(vars_), jnp.asarray(active)),
            thr,
        )
        np.testing.assert_allclose(np.asarray(pd.probs), ph, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pd.vars), vh, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(pd.active), ah)


def test_g1d_f32_cold_start_resolves():
    """Regression: at gam1 = 1e-6 the true g1d ~ 2.5e-8 sits below the f32
    ulp at 1.0; the reference-form '1 + sigma(...)' cancellation rounded
    alpha1 to 0 (making eta1 infinite and NaN-ing production runs).  The
    shrinkage form must carry full relative precision in f32."""
    import jax.numpy as jnp

    prior = init_prior([0.99, 0.01], [0.0, 0.00030518], 8192)
    d32 = np.asarray(g1d(jnp.zeros(8, dtype=jnp.float32), 1e-6, prior))
    d64 = np.asarray(g1d(jnp.zeros(8, dtype=jnp.float64), 1e-6, prior))
    assert d64[0] > 0
    np.testing.assert_allclose(d32, d64, rtol=1e-5)

    # nonzero y too, and g1 keeps full precision in the same regime
    y32 = jnp.full(8, 0.37, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(g1d(y32, 1e-6, prior)),
        np.asarray(g1d(y32.astype(jnp.float64), 1e-6, prior)), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g1(y32, 1e-6, prior)),
        np.asarray(g1(y32.astype(jnp.float64), 1e-6, prior)), rtol=1e-4)


def test_g1_pk_underflow_falls_back_to_maxvar_shrinkage():
    """When every mixture term underflows in f32 (an active component whose
    prob rounds to 0 at f32 plus huge |y| underflowing the other exponents),
    the posterior is dominated by the max-variance component: g1 must return
    y*vmax/(vmax+sigma) (not 0) and g1d its shrinkage factor (not 0)."""
    import jax.numpy as jnp

    # component 2 has the max variance but a prob below the f32
    # subnormal floor (~1.4e-45): it casts to exactly 0 in f32, so pk == 0
    prior = init_prior([0.9, 0.1 - 1e-46, 1e-46], [0.0, 1e-4, 1.0], 100)
    gam1 = 10.0
    sigma = 1.0 / gam1
    vmax = 100.0  # vars are scaled by N=100
    y = jnp.asarray([3000.0], dtype=jnp.float32)  # underflows comps 0 and 1

    got = float(g1(y, gam1, prior)[0])
    want = float(y[0]) * vmax / (vmax + sigma)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    d = float(g1d(y, gam1, prior)[0])
    np.testing.assert_allclose(d, vmax / (vmax + sigma), rtol=1e-4)
