"""Analysis-script ports (P2-P9): cross-checks against the engine outputs
and synthetic inputs."""

import os
import struct

import numpy as np
import pytest

from vampomi_tpu.scripts.conf_gibbs_init import get_probs, get_vars
from vampomi_tpu.scripts.pip import compute_pip
from vampomi_tpu.scripts.roc import roc_metrics


def test_pvals_script_cross_checks_engine(small_fixture, tmp_path):
    """scripts/p_vals recomputation must match the association_test SE output
    for the same iteration (the reference uses it as an oracle)."""
    import jax.numpy as jnp

    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.modes.association import run_association_test
    from vampomi_tpu.ops.operator import build_design
    from vampomi_tpu.dataset import Dataset
    from vampomi_tpu.io.phen import Phenotype
    from vampomi_tpu.scripts.p_vals import main as pvals_main

    fx = small_fixture
    n, m = fx.X.shape
    sqn = np.sqrt((n - 1) / np.sum((fx.y - fx.y.mean()) ** 2))
    y = fx.y * sqn

    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="s", iterations=3, h2=0.8,
        probs=[0.9, 0.07, 0.03], vars=[0.0, 1e-3, 1e-2],
        stop_criteria_thr=1e-9, meth_file="x", N=n, Mt=m,
    )
    infere_linear(dm, y, cfg, true_signal=fx.beta, write_outputs=True)

    # engine-mode SE p-values at iteration 3 with gam1 from the params csv
    from vampomi_tpu.io.csv_writer import read_positional_csv

    params = read_positional_csv(os.path.join(tmp_path, "s_params.csv"))
    gam1_it3 = params[2][2]
    ds = Dataset(dm=dm, phen=Phenotype(y=y, intercept=0.0, scale=1.0), covariates=None)
    cfg_se = cfg.replace(pval_method="se", gam1=gam1_it3,
                         r1_file=str(tmp_path / "s_r1_it_3.bin"))
    p_mode = run_association_test(ds, cfg_se)

    # script recomputation from the same artifacts
    p_script = pvals_main([
        "--out-name", "s_script_pvals",
        "--csv-params", str(tmp_path / "s_params.csv"),
        "--r1-file", str(tmp_path / "s_r1_it_3.bin"),
        "--it", "3", "--M", str(m), "--N", str(n),
    ])
    np.testing.assert_allclose(p_script, p_mode, rtol=1e-10)
    assert os.path.exists(tmp_path / "s_script_pvals.bin")


def test_roc_metrics_sanity():
    rng = np.random.default_rng(0)
    m = 500
    beta = np.zeros(m)
    beta[:50] = 1.0
    pvals = np.where(beta != 0, rng.uniform(0, 1e-6, m), rng.uniform(0.2, 1.0, m))
    r = roc_metrics(pvals, beta)
    assert r["auc"] > 0.99
    assert r["tpr"] > 0.95
    assert r["fdr"] < 0.05
    assert r["n_causal"] == 50


def test_r2_script(tmp_path, capsys):
    from vampomi_tpu.scripts.r2 import main as r2_main

    rng = np.random.default_rng(1)
    y = rng.normal(size=100)
    est = y + rng.normal(0, 0.1, 100)
    (tmp_path / "e.yhat").write_text("".join(f"{v:g}\n" for v in est))
    (tmp_path / "t.phen").write_text("".join(f"{i} {i} {v:.10f}\n" for i, v in enumerate(y)))
    r2 = r2_main(["--est", str(tmp_path / "e.yhat"), "--true", str(tmp_path / "t.phen")])
    assert 0.95 < r2 <= 1.0


def test_pip_from_bet_stream(tmp_path):
    m, iters = 20, 10
    path = str(tmp_path / "x.bet")
    rng = np.random.default_rng(2)
    include = rng.random((iters, m)) < 0.3
    with open(path, "wb") as f:
        f.write(struct.pack("I", m))
        for it in range(iters):
            f.write(struct.pack("I", it))
            beta = include[it] * rng.normal(size=m)
            # ensure "included" betas are nonzero
            beta[include[it] & (beta == 0)] = 1.0
            f.write(beta.astype("<f8").tobytes())
    pip = compute_pip(path, it_start=5, it_end=10)
    want = include[5:10].mean(axis=0)
    np.testing.assert_allclose(pip, want)


def test_conf_gibbs_helpers():
    probs, s = get_probs(4, 0.1)
    assert abs(sum(probs) - 1.0) < 1e-9
    assert probs[0] == 0.9
    assert len(s.split(",")) == 4
    vars_, vs = get_vars(4, var_max=0.1)
    assert vars_[0] == 0.0
    np.testing.assert_allclose(vars_[1:], [1e-3, 1e-2, 1e-1])


def test_conf_gibbs_init_end_to_end(tmp_path):
    from vampomi_tpu.scripts.conf_gibbs_init import main as conf_main

    rows = []
    for it in range(20):
        rows.append([it, 0, 0.5, 0.2, 0.75 + 0.01 * (it % 2), 42, 0, 3, 0.9, 0.07, 0.03])
    csv_path = tmp_path / "gibbs.csv"
    csv_path.write_text("\n".join(",".join(str(v) for v in r) for r in rows) + "\n")
    grm_path = tmp_path / "g.grm"
    grm_path.write_text("0 0.001 0.01\n")

    out = conf_main([
        "--csv", str(csv_path), "--grm", str(grm_path),
        "--out-dir", str(tmp_path), "--iterations", "5:15", "--rho", "0.4",
    ])
    lines = open(out).read().splitlines()
    assert lines[0].split("\t") == ["ID", "rho", "mix_comp", "lambda", "probs", "vars", "h2"]
    fields = lines[1].split("\t")
    assert fields[1] == "0.4"
    assert fields[2] == "3"
    assert abs(float(fields[3]) - 0.1) < 1e-9  # lambda = 1 - 0.9


def test_sim_top_iid_npy_stores(tmp_path):
    """The streaming simulator with .npy chromosome stores produces
    reference-format train/test bins readable by the dataset loader."""
    from vampomi_tpu.sim.sim_top_iid import simulate_top
    from vampomi_tpu.io.bin_io import read_meth_bin
    from vampomi_tpu.io.phen import read_phen

    rng = np.random.default_rng(5)
    n, m_chr = 60, [30, 20, 10]
    stores = tmp_path / "stores"
    stores.mkdir()
    chroms = []
    for i, mc in enumerate(m_chr):
        arr = rng.normal(size=(n, mc))
        np.save(stores / f"chr{i+1:02d}.npy", arr)
        chroms.append(arr)
    X_full = np.concatenate(chroms, axis=1)
    m = X_full.shape[1]

    out = tmp_path / "out"
    out.mkdir()
    r = simulate_top(str(stores), str(out), "ds", h2=0.8, lam=0.1,
                     ratio=0.7, m=m, n=n, seed=11)

    # mask consistency
    msk = np.loadtxt(out / (r["fname"] + ".msk")).astype(bool)
    assert msk.sum() == r["n_train"]

    # train bin is the masked, marker-major matrix
    Xtr = read_meth_bin(r["train_bin"], r["n_train"], m)
    np.testing.assert_allclose(Xtr, X_full[msk].T)
    Xte = read_meth_bin(r["test_bin"], r["n_test"], m)
    np.testing.assert_allclose(Xte, X_full[~msk].T)

    # dims + standardized phen (mean 0, var 1 over the union)
    dim = open(out / (r["fname_train"] + ".dim")).read().split()
    assert [int(dim[0]), int(dim[1])] == [r["n_train"], m]
    ph_tr = read_phen(str(out / (r["fname_train"] + ".phen")), r["n_train"], standardize=False)
    ph_te = read_phen(str(out / (r["fname_test"] + ".phen")), r["n_test"], standardize=False)
    y_all = np.concatenate([ph_tr.y, ph_te.y])
    assert abs(np.mean(y_all)) < 1e-6
    np.testing.assert_allclose(np.std(y_all), 1.0, atol=1e-6)

    beta = np.fromfile(out / (r["fname"] + "_beta_true.bin"))
    assert (beta != 0).sum() == int(m * 0.1)

def test_cli_consumes_init_conf(tmp_path):
    from vampomi_tpu.cli import parse_config

    conf = tmp_path / "w.conf"
    conf.write_text(
        "ID\trho\tmix_comp\tlambda\tprobs\tvars\th2\n"
        "x\t0.35\t3\t0.1\t0.9,0.07,0.03\t0.0,0.001,0.01\t0.77\n"
    )
    cfg = parse_config([
        "--meth-file", "m.bin", "--init-conf", str(conf),
    ])
    assert cfg.rho == 0.35 and cfg.h2 == 0.77
    assert cfg.probs == [0.9, 0.07, 0.03]
    assert cfg.vars == [0.0, 0.001, 0.01]
    # explicit flags still win
    cfg2 = parse_config([
        "--meth-file", "m.bin", "--init-conf", str(conf), "--probs", "0.5,0.5",
    ])
    assert cfg2.probs == [0.5, 0.5]
