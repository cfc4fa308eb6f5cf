"""High-level array API tests (vampomi_tpu/api.py): equivalence with the
engine path the CLI drives, signal recovery, in-memory association p-values,
out-of-sample prediction, and the probit surface."""

import numpy as np
import pytest

import vampomi_tpu.api as va
from vampomi_tpu.config import RunConfig
from vampomi_tpu.engine.linear import infere_linear
from vampomi_tpu.ops.operator import build_design
from vampomi_tpu.sim.data_sim import simulate_iid

PROBS3 = [0.9, 0.07, 0.03]
VARS3 = [0.0, 1e-3, 1e-2]
HYPER = dict(iterations=5, h2=0.8, probs=PROBS3, vars=VARS3,
             stop_criteria_thr=1e-8, seed=7)


@pytest.fixture(scope="module")
def fit(small_fixture):
    fx = small_fixture
    return va.fit_linear(fx.X, fx.y, mesh=None, quiet=True, **HYPER)


def test_fit_linear_matches_engine_path(small_fixture, fit):
    """api.fit_linear == read_phen-standardized y through infere_linear with
    the identical RunConfig — the CLI's own wiring."""
    fx = small_fixture
    import jax.numpy as jnp

    y_std, _ = va.standardize_phenotype(fx.y)
    cfg = RunConfig(**HYPER)
    cfg.N, cfg.Mt, cfg.meth_file = fx.y.size, fx.X.shape[1], "<in-memory>"
    dm = build_design(np.ascontiguousarray(fx.X.T), mesh=None,
                      compute_dtype=jnp.float64)
    ref = infere_linear(dm, y_std, cfg, write_outputs=False)

    np.testing.assert_allclose(fit.x1_hat_scaled, ref.x1_hat_scaled,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(fit.r1_scaled, ref.r1_scaled,
                               rtol=1e-12, atol=1e-14)
    assert fit.gam1 == ref.gam1 and fit.gamw == ref.gamw


def test_fit_linear_recovers_signal(small_fixture, fit):
    fx = small_fixture
    corr = np.corrcoef(fit.x1_hat_scaled, fx.beta)[0, 1]
    assert corr > 0.8, corr
    assert 0.0 < va.h2_estimate(fit) < 1.0


def test_fit_linear_auto_mesh_matches(small_fixture, fit):
    """Default mesh='auto' (the 8-device test mesh) reproduces the unsharded
    fit — the API inherits the engine's shard invariance."""
    fx = small_fixture
    sharded = va.fit_linear(fx.X, fx.y, quiet=True, **HYPER)
    np.testing.assert_allclose(sharded.x1_hat_scaled, fit.x1_hat_scaled,
                               rtol=1e-8, atol=1e-10)


def test_marker_major_layout(small_fixture, fit):
    fx = small_fixture
    mm = va.fit_linear(np.ascontiguousarray(fx.X.T), fx.y, mesh=None,
                       marker_major=True, quiet=True, **HYPER)
    np.testing.assert_allclose(mm.x1_hat_scaled, fit.x1_hat_scaled,
                               rtol=1e-12, atol=1e-14)


def test_association_pvals_in_memory(small_fixture, fit):
    fx = small_fixture
    p = va.association_pvals(fit, n=fx.y.size)
    assert p.shape == fx.beta.shape
    assert np.all((p >= 0.0) & (p <= 1.0))
    causal = fx.beta != 0.0
    # causal markers must carry far more evidence than null ones
    lg = -np.log10(np.maximum(p, 1e-300))
    assert np.median(lg[causal]) > 4.0 * np.median(lg[~causal])


def test_predict_linear_out_of_sample(small_fixture, fit):
    fx = small_fixture
    rng = np.random.default_rng(123)
    n_new = 200
    X_new = rng.normal(size=(n_new, fx.beta.size))
    y_new = X_new @ fx.beta + rng.normal(0.0, np.sqrt(0.2), n_new)
    yhat = va.predict_linear(fit, X_new, mesh=None)
    assert yhat.shape == (n_new,)
    y_std, _ = va.standardize_phenotype(y_new)
    corr = np.corrcoef(yhat, y_std)[0, 1]
    assert corr > 0.75, corr


def test_fit_probit_and_predict(small_fixture):
    fx = small_fixture
    rng = np.random.default_rng(5)
    # latent liability from the same sparse signal; boost SNR so the
    # 300-sample fixture classifies well above chance
    g = fx.X @ fx.beta
    z = g / np.std(g) + 0.3 * rng.normal(size=g.size)
    y01 = (z > 0).astype(np.float64)
    pfit = va.fit_probit(fx.X, y01, mesh=None, quiet=True,
                         iterations=4, probs=PROBS3, vars=VARS3,
                         stop_criteria_thr=1e-8, seed=7)
    assert pfit.r1_scaled is not None
    labels = va.predict_probit(pfit, fx.X, mesh=None)
    acc = float(np.mean(labels == y01))
    assert acc > 0.75, acc
    proba = va.predict_probit(pfit, fx.X, mesh=None, return_proba=True)
    assert np.all((proba >= 0.0) & (proba <= 1.0))
    np.testing.assert_array_equal(labels, (proba >= 0.5).astype(np.int64))


def test_api_error_paths(small_fixture):
    fx = small_fixture
    with pytest.raises(TypeError, match="unknown configuration"):
        va.fit_linear(fx.X, fx.y, mesh=None, quiet=True, bogus_flag=1)
    with pytest.raises(ValueError, match="probit y must be 0/1"):
        va.fit_probit(fx.X, fx.y, mesh=None, quiet=True)
    with pytest.raises(ValueError, match="samples"):
        va.fit_linear(fx.X, fx.y[:-1], mesh=None, quiet=True)
    with pytest.raises(ValueError, match="constant"):
        va.standardize_phenotype(np.ones(10))


def test_quiet_suppresses_narration(small_fixture, capsys):
    fx = small_fixture
    va.fit_linear(fx.X, fx.y, mesh=None, quiet=True, iterations=1,
                  probs=PROBS3, vars=VARS3, seed=7)
    assert capsys.readouterr().out == ""
