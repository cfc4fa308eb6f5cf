"""Work-dtype policy tests: the engine converges in every supported compute
dtype, vectors stay in the work dtype (bf16 X => f32 vectors), and scalar
bookkeeping stays f64 (see ops/operator.py precision policy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vampomi_tpu.config import RunConfig
from vampomi_tpu.engine.linear import infere_linear
from vampomi_tpu.ops.operator import atx, ax, build_design

PROBS3 = [0.9, 0.07, 0.03]
VARS3 = [0.0, 1e-3, 1e-2]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_operator_low_precision_close_to_f64(small_fixture, dtype):
    X = small_fixture.X
    dm64 = build_design(X.T, compute_dtype=jnp.float64)
    dmlo = build_design(X.T, compute_dtype=dtype)
    assert dmlo.X.dtype == dtype
    # bf16 X keeps vector math in f32 (work dtype)
    assert dmlo.wd == (jnp.float32 if dtype == jnp.bfloat16 else dtype)
    assert dmlo.mave.dtype == dmlo.wd

    rng = np.random.default_rng(0)
    x = rng.normal(size=X.shape[1])
    y = rng.normal(size=X.shape[0])
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-3
    ref_ax = np.asarray(ax(dm64, jnp.asarray(x)))
    lo_ax = np.asarray(ax(dmlo, jnp.asarray(x, dtype=dmlo.wd)), dtype=np.float64)
    assert np.linalg.norm(lo_ax - ref_ax) / np.linalg.norm(ref_ax) < tol
    ref_atx = np.asarray(atx(dm64, jnp.asarray(y)))
    lo_atx = np.asarray(atx(dmlo, jnp.asarray(y, dtype=dmlo.wd)), dtype=np.float64)
    assert np.linalg.norm(lo_atx - ref_atx) / np.linalg.norm(ref_atx) < tol


@pytest.mark.parametrize("dtype,solver", [
    (jnp.float32, "cg"),
    (jnp.float32, "spectral"),
    (jnp.bfloat16, "spectral"),
])
def test_engine_converges_low_precision(small_fixture, tmp_path, dtype, solver):
    """The TPU production dtypes recover the signal like the f64 oracle does."""
    fx = small_fixture
    dm = build_design(fx.X.T, compute_dtype=dtype)
    cfg = RunConfig(
        out_dir=str(tmp_path), out_name="d", iterations=8, rho=0.5, h2=0.8,
        gam1=1e-6, probs=list(PROBS3), vars=list(VARS3),
        stop_criteria_thr=1e-8, seed=7, trace=0, lmmse_solver=solver,
    )
    res = infere_linear(dm, fx.y, cfg, true_signal=fx.beta, write_outputs=False)
    corr = np.corrcoef(res.x1_hat_scaled, fx.beta)[0, 1]
    floor = 0.70 if dtype == jnp.bfloat16 else 0.75
    assert corr > floor, f"{dtype} {solver}: corr {corr}"
    assert np.isfinite(res.gamw)
