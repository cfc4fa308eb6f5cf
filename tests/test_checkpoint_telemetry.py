"""Exact-state checkpoint/resume and telemetry tests, plus the math utils."""

import json
import os

import jax.numpy as jnp
import numpy as np

from vampomi_tpu.config import RunConfig
from vampomi_tpu.engine.linear import infere_linear
from vampomi_tpu.engine.probit import infere_bin_class
from vampomi_tpu.io.csv_writer import read_positional_csv
from vampomi_tpu.ops.operator import build_design

PROBS3 = [0.9, 0.07, 0.03]
VARS3 = [0.0, 1e-3, 1e-2]


def cfg_for(tmp, **kw):
    d = dict(
        out_dir=str(tmp), out_name="ck", iterations=6, h2=0.8,
        probs=list(PROBS3), vars=list(VARS3), stop_criteria_thr=1e-9, seed=5,
    )
    d.update(kw)
    return RunConfig(**d)


def test_linear_resume_is_exact(small_fixture, tmp_path):
    """3 iterations + exact resume for 3 more == 6 straight iterations."""
    fx = small_fixture
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)

    d_full = tmp_path / "full"
    d_full.mkdir()
    full = infere_linear(dm, fx.y, cfg_for(d_full, iterations=6),
                         true_signal=fx.beta, write_outputs=True)

    d_a = tmp_path / "a"
    d_a.mkdir()
    ckpt = str(tmp_path / "state.npz")
    infere_linear(dm, fx.y, cfg_for(d_a, iterations=3, checkpoint_file=ckpt),
                  true_signal=fx.beta, write_outputs=True)
    assert os.path.exists(ckpt)

    d_b = tmp_path / "b"
    d_b.mkdir()
    resumed = infere_linear(dm, fx.y, cfg_for(d_b, iterations=6, resume_file=ckpt),
                            true_signal=fx.beta, write_outputs=True)

    np.testing.assert_allclose(resumed.x1_hat_scaled, full.x1_hat_scaled,
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(resumed.gamw, full.gamw, rtol=1e-12)

    # params rows 4-6 identical between straight and resumed runs
    pf = read_positional_csv(str(d_full / "ck_params.csv"))
    pb = read_positional_csv(str(d_b / "ck_params.csv"))
    assert [r[0] for r in pb] == [4.0, 5.0, 6.0]
    for rb in pb:
        rf = next(r for r in pf if r[0] == rb[0])
        np.testing.assert_allclose(rb, rf, rtol=1e-12)


def test_probit_resume_is_exact(tmp_path):
    from vampomi_tpu.sim.data_sim import simulate_iid

    fx = simulate_iid(n=200, m=150, lam=0.15, h2=0.9, seed=20)
    ybin = (fx.X @ fx.beta > 0).astype(float)
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)

    kw = dict(model="bin_class", gam1=1e-2, rho=0.3)
    full = infere_bin_class(dm, ybin, cfg_for(tmp_path, iterations=4, **kw),
                            true_signal=fx.beta, write_outputs=False)

    ckpt = str(tmp_path / "p.npz")
    infere_bin_class(dm, ybin, cfg_for(tmp_path, iterations=2, checkpoint_file=ckpt, **kw),
                     true_signal=fx.beta, write_outputs=False)
    resumed = infere_bin_class(dm, ybin, cfg_for(tmp_path, iterations=4, resume_file=ckpt, **kw),
                               true_signal=fx.beta, write_outputs=False)
    np.testing.assert_allclose(resumed.x1_hat_scaled, full.x1_hat_scaled,
                               rtol=1e-12, atol=1e-15)


def test_trace_jsonl(small_fixture, tmp_path):
    fx = small_fixture
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    infere_linear(dm, fx.y, cfg_for(tmp_path, iterations=2),
                  true_signal=fx.beta, write_outputs=True)
    path = tmp_path / "ck_trace.jsonl"
    recs = [json.loads(l) for l in open(path)]
    assert [r["iteration"] for r in recs] == [1, 2]
    for r in recs:
        assert r["cg_iters"] > 0
        assert r["matrix_passes"] == 2 * (r["cg_iters"] + 1) + 6
        assert r["gbps"] > 0
        assert "gam1" in r["extra"]


def test_math_utils():
    from scipy.special import erfcx as scipy_erfcx

    from vampomi_tpu.utils.mathx import calc_stdev, erfcx, normal_cdf, simulate_mixture

    x = np.array([-9.0, -3.0, -0.5, 0.0, 0.5, 3.0, 9.0, 15.0, 50.0])
    np.testing.assert_allclose(np.asarray(erfcx(x)), scipy_erfcx(x), rtol=1e-7)
    assert np.isinf(float(erfcx(-11.0)))  # reference clamp (utilities.cpp:295-296)

    from scipy.stats import norm

    z = np.linspace(-5, 5, 11)
    np.testing.assert_allclose(np.asarray(normal_cdf(z)), norm.cdf(z), rtol=1e-12)

    rng_draws = simulate_mixture(200000, [0.0, 1.0, 4.0], [0.5, 0.25, 0.25], seed=0)
    assert abs((rng_draws == 0).mean() - 0.5) < 0.01
    var = np.var(rng_draws)
    np.testing.assert_allclose(var, 0.25 * 1 + 0.25 * 4, rtol=0.05)

    v = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(calc_stdev(v), np.std(v, ddof=1))


def test_resume_preserves_earlier_csv_rows(small_fixture, tmp_path):
    """Resuming into the same out_dir must append to the positional CSVs,
    not delete and recreate them (rows written before the crash survive)."""
    import jax.numpy as jnp

    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.io.csv_writer import read_positional_csv
    from vampomi_tpu.ops.operator import build_design

    fx = small_fixture
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    common = dict(
        out_dir=str(tmp_path), out_name="rs", rho=0.5, h2=0.8, gam1=1e-6,
        probs=[0.9, 0.07, 0.03], vars=[0.0, 1e-3, 1e-2],
        stop_criteria_thr=1e-12, seed=7, trace=0,
    )
    ck = str(tmp_path / "state.npz")
    infere_linear(dm, fx.y, RunConfig(iterations=3, checkpoint_file=ck, **common),
                  true_signal=fx.beta)
    rows_before = read_positional_csv(str(tmp_path / "rs_params.csv"))
    assert len(rows_before) == 3

    infere_linear(dm, fx.y, RunConfig(iterations=5, resume_file=ck, **common),
                  true_signal=fx.beta)
    rows_after = read_positional_csv(str(tmp_path / "rs_params.csv"))
    assert len(rows_after) == 5, "pre-crash rows must survive the resume"
    assert rows_after[0] == rows_before[0]


def test_resume_rejects_mismatched_dataset(small_fixture, tmp_path):
    import jax.numpy as jnp
    import pytest

    from vampomi_tpu.config import RunConfig
    from vampomi_tpu.engine.linear import infere_linear
    from vampomi_tpu.ops.operator import build_design

    fx = small_fixture
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    ck = str(tmp_path / "s.npz")
    cfg = RunConfig(out_dir=str(tmp_path), out_name="mm", iterations=1,
                    probs=[0.9, 0.1], vars=[0.0, 1e-3], gam1=1e-6, h2=0.8,
                    stop_criteria_thr=0.0, trace=0, checkpoint_file=ck)
    infere_linear(dm, fx.y, cfg, write_outputs=False)

    dm_small = build_design(fx.X.T[:100], mesh=None, compute_dtype=jnp.float64)
    with pytest.raises(ValueError, match="does not match"):
        infere_linear(dm_small, fx.y, cfg.replace(resume_file=ck, checkpoint_file=""),
                      write_outputs=False)
