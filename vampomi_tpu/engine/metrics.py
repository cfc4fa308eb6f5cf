"""Error measures shared by the engine drivers.

Reference: `vamp::err_measures` (src/vamp.cpp:760-852) fills a 6-slot metrics
row [R2 denoising, x1 corr, R2 LMMSE, x2 corr, z1 corr^2, z2 corr^2]; the
probit driver uses confusion matrices instead (src/vamp_probit.cpp:631-663).
"""

from __future__ import annotations

import jax.numpy as jnp


def _corr(a, b):
    num = jnp.dot(a, b)
    den = jnp.sqrt(jnp.dot(a, a) * jnp.dot(b, b))
    return num / jnp.where(den == 0.0, 1.0, den)


def signal_metrics(x_hat, true_signal, n):
    """Corr(x_hat, x0) and L2 error of x_hat/sqrt(N) vs x0 (file units).
    All vector math stays in x_hat's dtype; outputs are f64 scalars."""
    ts = true_signal.astype(x_hat.dtype)
    inv_sqrt_n = (1.0 / jnp.sqrt(jnp.asarray(n, jnp.float64))).astype(x_hat.dtype)
    corr = _corr(x_hat, ts)
    diff = x_hat * inv_sqrt_n - ts
    ts2 = jnp.dot(ts, ts)
    l2 = jnp.sqrt(jnp.dot(diff, diff) / jnp.where(ts2 == 0.0, 1.0, ts2))
    return corr.astype(jnp.float64), l2.astype(jnp.float64)


def prediction_metrics(z_hat, y):
    """R2 = 1 - ||y - z||^2 / ||y||^2 and Corr(z, y)^2 (f64 scalars)."""
    yc = y.astype(z_hat.dtype)
    resid = yc - z_hat
    y2 = jnp.dot(yc, yc)
    r2 = 1.0 - (jnp.dot(resid, resid) / jnp.where(y2 == 0.0, 1.0, y2)).astype(jnp.float64)
    c = _corr(z_hat, yc).astype(jnp.float64)
    return r2, c * c


def confusion_counts(y, yhat):
    """TP, TN, FP, FN for 0/1 labels (reference src/vamp_probit.cpp:631-652)."""
    tp = jnp.sum((y == 1) & (yhat == 1))
    tn = jnp.sum((y == 0) & (yhat == 0))
    fp = jnp.sum((y == 0) & (yhat == 1))
    fn = jnp.sum((y == 1) & (yhat == 0))
    return tp, tn, fp, fn
