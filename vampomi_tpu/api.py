"""High-level in-memory Python API: arrays in, arrays out.

The CLI (cli.py) is the flag-for-flag reference surface
(src/main_meth.cpp, src/main_meth_probit.cpp); this module is the
library-first entry point for users whose design matrix and phenotype are
already numpy arrays — no .bin/.phen files, no output directory.  It wraps
exactly the same engine code paths the CLI drives (ops/operator.build_design
→ engine/linear.infere_linear / engine/probit.infere_bin_class), so every
number matches a file-driven run at the same configuration and seed:

    import vampomi_tpu.api as va
    fit = va.fit_linear(X, y, iterations=10, h2=0.8,
                        probs=[0.9, 0.1], vars=[0.0, 1e-2])
    fit.x1_hat_scaled          # (M,) posterior-mean effects, file units
    va.h2_estimate(fit)        # 1 - 1/gamma_w (reference scripts/metrics.py:134)
    p = va.association_pvals(fit, n=X.shape[0])       # SE p-values, in memory
    yhat = va.predict_linear(fit, X_new)              # out-of-sample score

Conventions (all reference-inherited, see SURVEY §2.4):
  * `X` is sample-major (N, M) like sklearn; pass marker_major=True if it is
    already the reference's marker-major (M, N) layout (data_sim.py:58).
  * linear `y` is scaled by 1/sd but NOT centered (src/data.cpp:88-103);
    probit `y` must be 0/1 and is used raw (src/data.cpp:40-43).
  * returned effect estimates are in "file units" (x1_hat / sqrt(N),
    src/vamp.cpp:237-239) — identical to what `_it_<k>.bin` dumps hold —
    so they plug straight into the existing test/predict tooling.
"""

from __future__ import annotations

import contextlib
import io
import os

import numpy as np

from .config import RunConfig
from .engine.linear import LinearResult, infere_linear
from .engine.probit import ProbitResult, infere_bin_class
from .modes.association import pvals_se
from .ops.operator import DesignMatrix, build_design
from .sharding import make_mesh
from .utils.mathx import normal_cdf

__all__ = [
    "fit_linear", "fit_probit", "predict_linear", "predict_probit",
    "association_pvals", "h2_estimate", "standardize_phenotype",
    "LinearResult", "ProbitResult",
]


def _marker_major(X, marker_major: bool) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    if X.ndim != 2:
        raise ValueError(f"X must be 2-D, got shape {X.shape}")
    return X if marker_major else np.ascontiguousarray(X.T)


def standardize_phenotype(y) -> tuple[np.ndarray, float]:
    """(y * 1/sd, 1/sd) — the reference's read_phen transform: scaled by the
    inverse sample sd, NOT centered (src/data.cpp:88-103; io/phen.py)."""
    y = np.asarray(y, dtype=np.float64).ravel()
    avg = float(y.sum() / y.size)
    ss = float(np.sum((y - avg) ** 2))
    if ss == 0.0:
        raise ValueError("phenotype is constant — cannot standardize")
    sqn = float(np.sqrt((y.size - 1.0) / ss))
    return y * sqn, sqn


def _make_config(n: int, mt: int, model: str, config: dict) -> RunConfig:
    cfg = RunConfig()
    # meth_file is the CLI's mandatory flag (cfg.check()); the API feeds
    # arrays directly, so mark the source for error messages only
    cfg.meth_file = "<in-memory>"
    for k, v in config.items():
        if not hasattr(cfg, k):
            raise TypeError(f"unknown configuration field {k!r} "
                            f"(see vampomi_tpu.config.RunConfig)")
        setattr(cfg, k, list(v) if isinstance(v, (tuple,)) else v)
    cfg.N, cfg.Mt, cfg.model = n, mt, model
    return cfg


def _build(X, marker_major, mesh, cfg) -> DesignMatrix:
    Xm = _marker_major(X, marker_major)
    if mesh == "auto":
        mesh = make_mesh()
    return build_design(
        Xm, mesh=mesh, compute_dtype=cfg.resolved_compute_dtype(),
        alpha_scale=cfg.alpha_scale, mt=Xm.shape[0],
    )


def fit_linear(
    X,
    y,
    *,
    marker_major: bool = False,
    mesh="auto",
    standardize_y: bool = True,
    true_signal=None,
    x1hat_init=None,
    covariates=None,
    quiet: bool = False,
    **config,
) -> LinearResult:
    """Linear gVAMP on in-memory arrays.

    X: (N, M) sample-major (or (M, N) with marker_major=True), y: (N,) raw
    phenotype.  `config` kwargs are RunConfig fields (iterations, h2, probs,
    vars, rho, compute_dtype, lmmse_solver, seed, ...).  No files are
    written.  `quiet` suppresses the engine's reference-style narration.
    Returns the engine LinearResult (x1_hat_scaled in file units).
    """
    Xm = _marker_major(X, marker_major)
    y = np.asarray(y, dtype=np.float64).ravel()
    if y.size != Xm.shape[1]:
        raise ValueError(f"y has {y.size} samples but X has {Xm.shape[1]}")
    if standardize_y:
        y, _ = standardize_phenotype(y)
    cfg = _make_config(n=y.size, mt=Xm.shape[0], model="linear", config=config)
    dm = _build(Xm, True, mesh, cfg)
    sink = io.StringIO() if quiet else None
    with contextlib.redirect_stdout(sink) if sink else contextlib.nullcontext():
        return infere_linear(
            dm, y, cfg,
            true_signal=None if true_signal is None else np.asarray(true_signal, dtype=np.float64),
            x1hat_init=None if x1hat_init is None else np.asarray(x1hat_init, dtype=np.float64),
            covariates=None if covariates is None else np.asarray(covariates, dtype=np.float64),
            write_outputs=False,
        )


def fit_probit(
    X,
    y,
    *,
    marker_major: bool = False,
    mesh="auto",
    true_signal=None,
    x1hat_init=None,
    covariates=None,
    quiet: bool = False,
    **config,
) -> ProbitResult:
    """Probit GLM-VAMP (binary classification) on in-memory arrays.

    y must be 0/1 (used raw — the reference never standardizes the probit
    phenotype, src/data.cpp:40-43).  Covariates, if given, are the z-scored
    (N, C) matrix and are fit by the one-time Newton step
    (src/vamp_probit.cpp:525-617)."""
    Xm = _marker_major(X, marker_major)
    y = np.asarray(y, dtype=np.float64).ravel()
    if y.size != Xm.shape[1]:
        raise ValueError(f"y has {y.size} samples but X has {Xm.shape[1]}")
    bad = ~np.isin(y, (0.0, 1.0))
    if bad.any():
        raise ValueError("probit y must be 0/1 "
                         f"(found {y[bad][:3]} ...)")
    cfg = _make_config(n=y.size, mt=Xm.shape[0], model="bin_class", config=config)
    dm = _build(Xm, True, mesh, cfg)
    sink = io.StringIO() if quiet else None
    with contextlib.redirect_stdout(sink) if sink else contextlib.nullcontext():
        return infere_bin_class(
            dm, y, cfg,
            true_signal=None if true_signal is None else np.asarray(true_signal, dtype=np.float64),
            x1hat_init=None if x1hat_init is None else np.asarray(x1hat_init, dtype=np.float64),
            covariates=None if covariates is None else np.asarray(covariates, dtype=np.float64),
            write_outputs=False,
        )


def _beta_of(fit) -> np.ndarray:
    if isinstance(fit, (LinearResult, ProbitResult)):
        return np.asarray(fit.x1_hat_scaled, dtype=np.float64)
    return np.asarray(fit, dtype=np.float64).ravel()


def predict_linear(
    fit,
    X_new,
    *,
    marker_major: bool = False,
    mesh="auto",
    compute_dtype: str = "auto",
    alpha_scale: float = 1.0,
) -> np.ndarray:
    """Out-of-sample linear score: A_test (beta * sqrt(N_test)).

    Mirrors the reference test mode's rescale-by-sqrt(N_test) of a file-unit
    estimate (src/main_meth.cpp:174-175): X_new is standardized with ITS OWN
    marker statistics, exactly as a test-split .bin would be.  `fit` is a
    LinearResult or a bare (M,) file-unit effect vector.  The score is in
    standardized-phenotype units (compare against y_test * 1/sd_test)."""
    import jax.numpy as jnp

    beta = _beta_of(fit)
    cfg = RunConfig()
    cfg.compute_dtype, cfg.alpha_scale = compute_dtype, alpha_scale
    Xm = _marker_major(X_new, marker_major)
    if Xm.shape[0] != beta.size:
        raise ValueError(f"fit has {beta.size} markers but X_new has {Xm.shape[0]}")
    dm = _build(Xm, True, mesh, cfg)
    n_new = Xm.shape[1]
    xp = np.zeros(dm.m_pad, dtype=np.float64)
    xp[: beta.size] = beta * np.sqrt(float(n_new))
    from .ops.operator import ax

    return np.asarray(ax(dm, jnp.asarray(xp))).astype(np.float64)


def predict_probit(
    fit,
    X_new,
    *,
    marker_major: bool = False,
    mesh="auto",
    compute_dtype: str = "auto",
    covariates=None,
    return_proba: bool = False,
) -> np.ndarray:
    """Probit prediction on new samples.

    Default: 0/1 class labels via Phi(z) >= 0.5 — the reference's test-mode
    decision rule (src/main_meth_probit.cpp:160-199).  return_proba=True
    returns Phi(z + Z @ cov_eff) instead.  Covariate effects ride along when
    `fit` is a ProbitResult with cov_eff and `covariates` is given."""
    import jax.numpy as jnp

    z = predict_linear(fit, X_new, marker_major=marker_major, mesh=mesh,
                       compute_dtype=compute_dtype)
    if (covariates is not None and isinstance(fit, ProbitResult)
            and fit.cov_eff is not None):
        z = z + np.asarray(covariates, dtype=np.float64) @ np.asarray(
            fit.cov_eff, dtype=np.float64)
    proba = np.asarray(normal_cdf(jnp.asarray(z))).astype(np.float64)
    return proba if return_proba else (proba >= 0.5).astype(np.int64)


def association_pvals(fit, n: int, method: str = "se") -> np.ndarray:
    """Marker association p-values from a fit, fully in memory.

    method="se": the reference's r1/gam1 normal test (scripts/p_vals.py:44-62,
    src/main_meth.cpp:233-239) on the fit's final (r1, gam1) extrinsic pair.
    The LOO variants need the raw design matrix and live in
    modes/association.pvals_loo (file-driven)."""
    if method != "se":
        raise ValueError("in-memory association supports method='se'; "
                         "use modes/association.run_association_test or the "
                         "CLI --run-mode association_test for loo/loo_std")
    if fit.r1_scaled is None:
        raise ValueError("fit carries no r1 (older checkpointed result?)")
    return pvals_se(np.asarray(fit.r1_scaled), float(fit.gam1), int(n))


def h2_estimate(fit: LinearResult) -> float:
    """Heritability estimate 1 - 1/gamma_w (reference scripts/metrics.py:134;
    gamma_w is the EM noise precision of the 1/sd-scaled phenotype)."""
    return 1.0 - 1.0 / float(fit.gamw)
