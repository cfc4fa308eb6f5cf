"""Run-mode tests: out-of-sample test, SE/LOO association, predict."""

import os

import jax.numpy as jnp
import numpy as np
from scipy.stats import linregress, norm

from vampomi_tpu.config import RunConfig
from vampomi_tpu.dataset import Dataset
from vampomi_tpu.io.phen import Phenotype
from vampomi_tpu.modes.association import pvals_loo, pvals_se, run_association_test
from vampomi_tpu.modes.predict import run_predict
from vampomi_tpu.modes.test_mode import run_test_linear, run_test_probit
from vampomi_tpu.ops.operator import build_design


def make_ds(fx, standardize=True):
    X = fx.X
    dm = build_design(X.T, mesh=None, compute_dtype=jnp.float64)
    n = X.shape[0]
    y = fx.y
    if standardize:
        sqn = np.sqrt((n - 1) / np.sum((y - y.mean()) ** 2))
        y = y * sqn
    return Dataset(dm=dm, phen=Phenotype(y=y, intercept=0.0, scale=1.0), covariates=None)


def test_run_test_linear_matches_manual(small_fixture, tmp_path):
    fx = small_fixture
    n, m = fx.X.shape
    ds = make_ds(fx)
    # fabricate two iteration estimates in file units
    rng = np.random.default_rng(0)
    for it, scale in ((1, 0.0), (2, 1.0)):
        est = fx.beta * scale + rng.normal(0, 1e-3, m)
        est.astype("<f8").tofile(tmp_path / f"e_it_{it}.bin")

    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="tt", N_test=n, Mt=m,
        estimate_file=str(tmp_path / "e_it_1.bin"), test_iter_range=[1, 2],
        meth_file="x",
    )
    rows = run_test_linear(ds, cfg)
    assert len(rows) == 2
    # manual check of iteration 2
    est = np.fromfile(tmp_path / "e_it_2.bin") * np.sqrt(n)
    mu = fx.X.mean(axis=0)
    sd = np.sqrt(((fx.X - mu) ** 2).sum(axis=0) / (n - 1))
    A = (fx.X - mu) / sd / np.sqrt(n)
    z = A @ est
    y = ds.phen.y
    r2_manual = 1 - np.sum((y - z) ** 2) / (np.var(y, ddof=1) * n)
    np.testing.assert_allclose(rows[1][0], r2_manual, rtol=1e-9)
    assert rows[1][0] > 0.5  # near-true estimate predicts well
    assert os.path.exists(tmp_path / "tt_test.csv")


def test_pvals_se_matches_scipy():
    rng = np.random.default_rng(1)
    r1 = rng.normal(size=50)
    gam1, n = 3.0, 200
    got = pvals_se(r1, gam1, n)
    scale = np.sqrt(1 / (gam1 * n))
    want = np.array([
        norm.cdf(0, loc=v, scale=scale) if v > 0 else 1 - norm.cdf(0, loc=v, scale=scale)
        for v in r1
    ])
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert np.all((got >= 0) & (got <= 1))


def test_pvals_loo_matches_bruteforce(small_fixture):
    """LOO p-values must equal per-marker scipy regressions of
    y_mod + X_j x_j / sqrt(N) on raw X_j."""
    fx = small_fixture
    n, m = fx.X.shape
    ds = make_ds(fx)
    x1_up = fx.beta * np.sqrt(n)  # internal-scale estimate

    got = pvals_loo(ds, x1_up)

    # brute force (first 40 markers to keep it fast)
    mu = fx.X.mean(axis=0)
    sd = np.sqrt(((fx.X - mu) ** 2).sum(axis=0) / (n - 1))
    A = (fx.X - mu) / sd / np.sqrt(n)
    y_mod = ds.phen.y - A @ x1_up
    for j in range(40):
        y_mark = y_mod + fx.X[:, j] / np.sqrt(n) * x1_up[j]
        res = linregress(fx.X[:, j], y_mark)
        np.testing.assert_allclose(got[j], res.pvalue, rtol=1e-7, atol=1e-12)


def test_pvals_loo_std_matches_bruteforce(small_fixture):
    """loo_std adds back the STANDARDIZED marker contribution — the column z1
    actually used — instead of the reference's raw-marker quirk Q5."""
    fx = small_fixture
    n, m = fx.X.shape
    ds = make_ds(fx)
    x1_up = fx.beta * np.sqrt(n)

    got = pvals_loo(ds, x1_up, standardized=True)

    mu = fx.X.mean(axis=0)
    sd = np.sqrt(((fx.X - mu) ** 2).sum(axis=0) / (n - 1))
    A = (fx.X - mu) / sd / np.sqrt(n)
    y_mod = ds.phen.y - A @ x1_up
    for j in range(40):
        y_mark = y_mod + A[:, j] * x1_up[j]
        res = linregress(fx.X[:, j], y_mark)
        np.testing.assert_allclose(got[j], res.pvalue, rtol=1e-7, atol=1e-12)

    # the two variants genuinely differ when marker sds differ from 1
    quirk = pvals_loo(ds, x1_up, standardized=False)
    assert np.max(np.abs(np.log10(got + 1e-300) - np.log10(quirk + 1e-300))) > 0.1


def test_pvals_loo_quantized_matches_bruteforce(small_fixture):
    """LOO on an int8-quantized design: the implementation works in code
    space (moments of the stored codes, add-back coefficient rescaled by
    the dequantization scale s_j); per-marker affine invariance of the t
    statistic makes that equal to regressing on the dequantized marker with
    the reference's raw-unit add-back."""
    import pytest
    from vampomi_tpu.ops.operator import quantize_markers

    fx = small_fixture
    n, m = fx.X.shape
    qinfo: dict = {}
    dm = build_design(
        fx.X.T, mesh=None, compute_dtype=jnp.int8, quant_out=qinfo
    )
    sqn = np.sqrt((n - 1) / np.sum((fx.y - fx.y.mean()) ** 2))
    y = fx.y * sqn
    ds = Dataset(
        dm=dm, phen=Phenotype(y=y, intercept=0.0, scale=1.0),
        covariates=None, qscale=qinfo["scale"],
    )
    x1_up = fx.beta * np.sqrt(n)

    got = pvals_loo(ds, x1_up)

    # oracle: the DEQUANTIZED matrix (what the quantized operator actually
    # models), f64 throughout
    Xq, s, z = quantize_markers(fx.X.T)
    Xdq = (s[:, None] * Xq + z[:, None]).T  # (N, M)
    mu = Xdq.mean(axis=0)
    sd = np.sqrt(((Xdq - mu) ** 2).sum(axis=0) / (n - 1))
    A = (Xdq - mu) / sd / np.sqrt(n)
    y_mod = y - A @ x1_up
    lg = np.log10(got[:40] + 1e-300)
    want = np.empty(40)
    for j in range(40):
        y_mark = y_mod + Xdq[:, j] / np.sqrt(n) * x1_up[j]
        want[j] = linregress(Xdq[:, j], y_mark).pvalue
    # f32 vectors + bf16-rounded y_mod in the xy pass bound the agreement
    np.testing.assert_allclose(lg, np.log10(want + 1e-300), atol=0.1)

    # and the quantized result tracks the float-design quirk p-values
    ds64 = make_ds(fx)
    p64 = pvals_loo(ds64, x1_up)
    mask = p64 < 1e-4  # well-resolved tail
    assert mask.sum() > 10
    np.testing.assert_allclose(
        np.log10(got[mask]), np.log10(p64[mask]), rtol=0.08
    )

    # without the scale the raw-quirk variant must refuse, and loo_std
    # (code-space coefficients only) must still work
    ds_noscale = Dataset(
        dm=dm, phen=Phenotype(y=y, intercept=0.0, scale=1.0), covariates=None
    )
    with pytest.raises(ValueError, match="dequantization scale"):
        pvals_loo(ds_noscale, x1_up)
    p_std = pvals_loo(ds_noscale, x1_up, standardized=True)
    assert np.all(np.isfinite(p_std))


def test_run_association_modes(small_fixture, tmp_path):
    fx = small_fixture
    n, m = fx.X.shape
    ds = make_ds(fx)
    (fx.beta).astype("<f8").tofile(tmp_path / "w_it_5.bin")
    rng = np.random.default_rng(2)
    rng.normal(size=m).astype("<f8").tofile(tmp_path / "w_r1_it_5.bin")

    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="w", N=n, Mt=m, gam1=2.0,
        pval_method="se", r1_file=str(tmp_path / "w_r1_it_5.bin"), meth_file="x",
    )
    p_se = run_association_test(ds, cfg)
    assert os.path.exists(tmp_path / "w_it_5_pval_se.bin")
    assert len(p_se) == m

    cfg = cfg.replace(pval_method="loo", estimate_file=str(tmp_path / "w_it_5.bin"))
    p_loo = run_association_test(ds, cfg)
    assert os.path.exists(tmp_path / "w_it_5_pval_loo.bin")
    causal = fx.beta != 0
    thr = 0.05 / m
    assert (p_loo[causal] <= thr).sum() > 0.4 * causal.sum()
    assert (p_loo[~causal] <= thr).sum() < 0.1 * (~causal).sum()


def test_run_predict_writes_yhat(small_fixture, tmp_path):
    fx = small_fixture
    n, m = fx.X.shape
    ds = make_ds(fx, standardize=False)
    fx.beta.astype("<f8").tofile(tmp_path / "p_it_3.bin")
    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="p", N_test=n, Mt=m,
        estimate_file=str(tmp_path / "p_it_3.bin"), meth_file="x",
    )
    z = run_predict(ds, cfg)
    yhat_file = tmp_path / "p_.yhat"
    assert yhat_file.exists()
    vals = np.array([float(l) for l in yhat_file.read_text().splitlines()])
    assert len(vals) == n
    np.testing.assert_allclose(vals, z, rtol=1e-4, atol=1e-5)  # %g text precision


def test_run_test_probit_confusion(small_fixture, tmp_path):
    fx = small_fixture
    n, m = fx.X.shape
    ybin = (fx.X @ fx.beta > 0).astype(float)
    ds = Dataset(
        dm=build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64),
        phen=Phenotype(y=ybin, intercept=0.0, scale=1.0),
        covariates=None,
    )
    (fx.beta * 3).astype("<f8").tofile(tmp_path / "b_it_1.bin")
    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="b", N_test=n, Mt=m, model="bin_class",
        estimate_file=str(tmp_path / "b_it_1.bin"), test_iter_range=[1, 1],
        meth_file="x",
    )
    rows = run_test_probit(ds, cfg)
    tp, tn, fp, fn, acc = rows[0]
    assert tp + tn + fp + fn == n
    assert acc > 0.8  # strong estimate classifies well
    # headerless CSV (reference quirk)
    raw = open(tmp_path / "b_test.csv", "rb").read()
    assert not raw.lstrip(b"\x00").startswith(b"iteration")


def test_run_test_linear_zero_estimate_no_nan(small_fixture, tmp_path):
    """All-zero estimate (cold-start iteration 1) -> corr row is 0, not NaN.
    Deliberate divergence from the reference, which divides by ||z|| = 0
    (src/main_meth.cpp:181-192)."""
    import warnings

    fx = small_fixture
    n, m = fx.X.shape
    ds = make_ds(fx)
    np.zeros(m, dtype="<f8").tofile(tmp_path / "z_it_1.bin")
    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="zz", N_test=n, Mt=m,
        estimate_file=str(tmp_path / "z_it_1.bin"), test_iter_range=[1, 1],
        meth_file="x",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning -> failure
        rows = run_test_linear(ds, cfg)
    assert rows[0][1] == 0.0 and np.isfinite(rows[0][0])
