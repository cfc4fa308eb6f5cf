"""End-to-end CLI tests: the full parse → load → dispatch path for every run
mode, executed in-process on the forced-CPU test platform (the same surface
the reference exposes as main_meth.exe / main_meth_probit.exe)."""

import os

import numpy as np
import pytest

from vampomi_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from vampomi_tpu.sim.data_sim import main as sim_main

    d = tmp_path_factory.mktemp("cli")
    sim_main(["--out-dir", str(d), "--out-name", "ex",
              "-N", "150", "-M", "200", "--seed", "2"])
    return d


def run(args):
    assert cli_main(args) in (0, None)


def test_cli_full_linear_pipeline(fixture_dir):
    d = str(fixture_dir)
    run([
        "--run-mode", "infere", "--model", "linear",
        "--meth-file", f"{d}/ex.bin", "--phen-file", f"{d}/ex.phen",
        "--true-signal-file", f"{d}/ex_ts.bin", "--N", "150", "--Mt", "200",
        "--out-dir", d, "--out-name", "r", "--iterations", "4", "--h2", "0.8",
        "--probs", "0.9,0.07,0.03", "--vars", "0.0,0.001,0.01", "--trace", "0",
    ])
    assert os.path.exists(f"{d}/r_it_4.bin")
    assert os.path.exists(f"{d}/r_params.csv")

    run([
        "--run-mode", "test", "--model", "linear",
        "--meth-file-test", f"{d}/ex.bin", "--phen-file-test", f"{d}/ex.phen",
        "--N-test", "150", "--Mt", "200",
        "--estimate-file", f"{d}/r_it_4.bin", "--test-iter-range", "1,4",
        "--out-dir", d, "--out-name", "r",
    ])
    assert os.path.exists(f"{d}/r_test.csv")

    run([
        "--run-mode", "association_test", "--pval-method", "se",
        "--meth-file", f"{d}/ex.bin", "--phen-file", f"{d}/ex.phen",
        "--N", "150", "--Mt", "200", "--r1-file", f"{d}/r_r1_it_4.bin",
        "--gam1", "2.0", "--out-dir", d, "--out-name", "r",
    ])
    p = np.fromfile(f"{d}/r_it_4_pval_se.bin")
    assert p.shape == (200,) and np.all((p >= 0) & (p <= 1))

    run([
        "--run-mode", "association_test", "--pval-method", "loo",
        "--meth-file", f"{d}/ex.bin", "--phen-file", f"{d}/ex.phen",
        "--N", "150", "--Mt", "200", "--estimate-file", f"{d}/r_it_4.bin",
        "--out-dir", d, "--out-name", "r",
    ])
    p = np.fromfile(f"{d}/r_it_4_pval_loo.bin")
    assert p.shape == (200,) and np.all((p >= 0) & (p <= 1))


def test_cli_probit_and_predict(fixture_dir):
    d = str(fixture_dir)
    # binarize the phenotype into a fresh .phen
    rows = open(f"{d}/ex.phen").read().splitlines()
    with open(f"{d}/exb.phen", "w") as f:
        for r in rows:
            fid, iid, v = r.split()
            f.write(f"{fid} {iid} {int(float(v) > 0)}\n")

    run([
        "--run-mode", "infere", "--model", "bin_class",
        "--meth-file", f"{d}/ex.bin", "--phen-file", f"{d}/exb.phen",
        "--N", "150", "--Mt", "200", "--out-dir", d, "--out-name", "pb",
        "--iterations", "3", "--gam1", "1e-2", "--rho", "0.3",
        "--probs", "0.85,0.1,0.05", "--vars", "0.0,0.001,0.01", "--trace", "0",
    ])
    assert os.path.exists(f"{d}/pb_it_3.bin")

    run([
        "--run-mode", "predict", "--model", "bin_class",
        "--meth-file-test", f"{d}/ex.bin", "--phen-file-test", f"{d}/exb.phen",
        "--N-test", "150", "--Mt", "200",
        "--estimate-file", f"{d}/pb_it_3.bin",
        "--out-dir", d, "--out-name", "pb",
    ])
    yhat_files = [f for f in os.listdir(d) if f.endswith(".yhat")]
    assert yhat_files, "predict mode must write a .yhat file"

    run([
        "--run-mode", "test", "--model", "bin_class",
        "--meth-file-test", f"{d}/ex.bin", "--phen-file-test", f"{d}/exb.phen",
        "--N-test", "150", "--Mt", "200",
        "--estimate-file", f"{d}/pb_it_3.bin", "--test-iter-range", "1,3",
        "--out-dir", d, "--out-name", "pb",
    ])
    assert os.path.exists(f"{d}/pb_test.csv")


def test_num_mix_comp_decorative_warning(capsys):
    """--num-mix-comp is decorative (prior size = len(--probs), reference
    options.cpp:147-155 / SURVEY Q6); an explicitly disagreeing value warns,
    silence otherwise."""
    from vampomi_tpu.cli import parse_config

    base = ["--meth-file", "x.bin", "--probs", "0.9,0.1", "--vars", "0,1e-2"]
    cfg = parse_config(base + ["--num-mix-comp", "5"])
    assert cfg.num_mix_comp == 5 and len(cfg.probs) == 2
    assert "decorative" in capsys.readouterr().out

    cfg = parse_config(base)                       # flag not passed: silent
    assert cfg.num_mix_comp == 10                  # reference code default
    assert "decorative" not in capsys.readouterr().out

    cfg = parse_config(base + ["--num-mix-comp", "2"])   # agreeing: silent
    assert "decorative" not in capsys.readouterr().out
