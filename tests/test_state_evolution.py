"""State-evolution tracking: the engine's (alpha1, gam2, alpha2, gam1)
trajectory must follow the first-principles scalar SE recursion on an i.i.d.
fixture — the one correctness check NOT derived from reading src/vamp.cpp
(see tests/state_evolution.py for why it is independent).

Run matched: prior initialized at the truth (EM then must STAY at the truth
— a misread EM update, src/vamp.cpp:531-643, drifts the prior and breaks
tracking), no damping (rho = 1), true h2 (gamw EM must stay near
1/(1-h2)).

What is asserted, and why these tolerances:
  * iteration 1 is deterministic given the fixture (r1 = 0 enters the
    denoiser): alpha1/gam2 match SE to ~1e-3 (finite-M), alpha2 to ~1%
    (finite-N Marchenko-Pastur edge), and gam1_next to ~15% (gam1_next =
    gam2 (1/alpha2 - 1) amplifies alpha2's error by 1/(1-alpha2) ~ 20x);
  * the undamped engine oscillates around the SE path with Monte-Carlo
    noise ~1/sqrt(CM) ~ 6% per iteration, then settles: the mean of late
    iterations must sit at the SE fixed point;
  * gamw (noise-precision EM, src/vamp.cpp:504-529) must hold near the true
    1/(1-h2) — a wrong trace correction drifts it.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vampomi_tpu.config import RunConfig
from vampomi_tpu.engine.linear import infere_linear
from vampomi_tpu.io.csv_writer import read_positional_csv
from vampomi_tpu.ops.operator import build_design
from vampomi_tpu.sim.data_sim import simulate_iid

from tests.state_evolution import se_trajectory

N, M = 1536, 24576
LAM, H2 = 0.01, 0.8
ITERS = 12
SETTLED = 7  # 1-based iteration from which the engine has settled


@pytest.fixture(scope="module")
def se_run(tmp_path_factory):
    fx = simulate_iid(n=N, m=M, lam=LAM, h2=H2, seed=5)
    cm = int(M * LAM)  # matches simulate_iid's causal count
    probs = [1.0 - cm / M, cm / M]
    vars_beta = [0.0, H2 / cm]

    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.float64)
    cfg = RunConfig(
        out_dir=str(tmp_path_factory.mktemp("se")), out_name="se",
        iterations=ITERS, rho=1.0, h2=H2, gam1=1e-6,
        probs=probs, vars=vars_beta,
        CG_max_iter=500, CG_err_tol=1e-6, EM_max_iter=1, EM_err_thr=1e-2,
        learn_vars=1, learn_prior_delay=0, merge_vars_thr=0.5,
        stop_criteria_thr=0.0, seed=3, meth_file="x",
    )
    res = infere_linear(dm, fx.y, cfg, true_signal=fx.beta, write_outputs=True)

    params = read_positional_csv(os.path.join(cfg.out_dir, "se_params.csv"))
    # params rows: [it, alpha1, gam1(denoise), alpha2, gam2, gamw]
    engine = [dict(alpha1=r[1], gam1=r[2], alpha2=r[3], gam2=r[4], gamw=r[5])
              for r in params]

    vars_internal = [0.0, N * H2 / cm]
    se = se_trajectory(
        gam1_0=cfg.gam1, gamw=1.0 / (1.0 - H2),
        probs=probs, vars_internal=vars_internal,
        gamma=N / M, iterations=40,  # run SE to its fixed point
    )
    return engine, se, res


def test_iteration1_matches_se(se_run):
    """Iteration 1 (deterministic input r1 = 0): the denoiser stage must hit
    the SE values on the nose; the LMMSE stage to finite-N MP accuracy."""
    engine, se, _ = se_run
    e, s = engine[0], se[0]
    np.testing.assert_allclose(e["alpha1"], s["alpha1"], rtol=2e-3)
    np.testing.assert_allclose(e["gam2"], s["gam2"], rtol=2e-3)
    np.testing.assert_allclose(e["alpha2"], s["alpha2"], rtol=0.01)
    # gam1_next = gam2 (1/alpha2 - 1): alpha2's 1% is amplified ~20x
    np.testing.assert_allclose(engine[1]["gam1"], s["gam1_next"], rtol=0.15)


def test_engine_settles_at_se_fixed_point(se_run):
    """Mean over settled iterations == SE fixed point within MC error
    (~1/sqrt(CM) = 6% per iteration, averaged over 6 iterations)."""
    engine, se, _ = se_run
    fp = se[-1]
    tail = engine[SETTLED - 1:]
    mean = {k: float(np.mean([e[k] for e in tail]))
            for k in ("alpha1", "gam2", "alpha2")}
    np.testing.assert_allclose(mean["alpha1"], fp["alpha1"], rtol=0.20,
                               err_msg="alpha1 fixed point (denoiser/EM?)")
    np.testing.assert_allclose(mean["gam2"], fp["gam2"], rtol=0.25,
                               err_msg="gam2 fixed point")
    np.testing.assert_allclose(mean["alpha2"], fp["alpha2"], rtol=0.02,
                               err_msg="alpha2 fixed point (LMMSE/Onsager?)")


def test_trajectory_brackets_se(se_run):
    """The undamped engine oscillates AROUND the SE path: every engine gam2
    must stay within the SE trajectory's envelope (expanded by MC error) —
    a systematic bias (wrong denoiser scale, wrong Onsager) escapes it."""
    engine, se, _ = se_run
    se_vals = [s["gam2"] for s in se]
    lo = min(se_vals) * 0.5
    hi = max(se_vals) * 1.4
    for t in range(1, ITERS):
        assert lo < engine[t]["gam2"] < hi, (t + 1, engine[t]["gam2"], (lo, hi))


def test_gamw_stays_matched(se_run):
    """Noise-precision EM must hold gamw near the true 1/(1-h2)."""
    engine, _, _ = se_run
    gamw_true = 1.0 / (1.0 - H2)
    for t in range(2, ITERS):
        assert abs(engine[t]["gamw"] - gamw_true) / gamw_true < 0.15, (
            t, engine[t]["gamw"], gamw_true)


def test_se_predicted_recovery_achieved(se_run):
    """SE predicts the achievable correlation: corr^2 = 1 - mmse/var(x0);
    the engine must reach it (within MC slack) — and not exceed what is
    information-theoretically possible by more than noise."""
    engine, se, res = se_run
    from tests.state_evolution import posterior_mmse

    cm = int(M * LAM)
    vars_internal = [0.0, N * H2 / cm]
    var_x0 = (cm / M) * vars_internal[1]
    fp_gam1 = se[-1]["gam1_next"]
    mmse = posterior_mmse(fp_gam1, [1.0 - cm / M, cm / M], vars_internal)
    corr_pred = np.sqrt(max(0.0, 1.0 - mmse / var_x0))
    corr_eng = float(np.asarray(res.metrics_history[-1])[1])
    assert abs(corr_eng - corr_pred) < 0.08, (corr_eng, corr_pred)
