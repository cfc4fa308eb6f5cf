"""Math utilities completing the reference's runtime-library surface
(src/utilities.cpp): erfcx, normal_cdf, the Gaussian-mixture sampler, the
synced stdev, and the SNR-based noise-precision estimate.

The jax `erfcx` here is a stable composition (not the reference's fma
polynomial): exp(x^2) erfc(x) in the moderate range, the continued-fraction
asymptotic for large x, and the reflection erfcx(x) = 2 exp(x^2) - erfcx(-x)
for negative x (clamped like the reference at |x| > 10, utilities.cpp:293-298).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def erfcx(x):
    """Scaled complementary error function, exp(x^2) * erfc(x), jax-traceable."""
    from jax.scipy.special import erfc

    x = jnp.asarray(x, dtype=jnp.float64)
    ax = jnp.abs(x)

    # moderate |x|: direct product is exact (exp(x^2) < 1e43 for |x| < 10)
    direct = jnp.exp(jnp.square(jnp.minimum(ax, 10.0))) * erfc(jnp.minimum(ax, 10.0))

    # large x > 10: asymptotic continued fraction 1/(sqrt(pi) x) * (1 - 1/(2x^2) + 3/(4x^4) - ...)
    ax2 = ax * ax
    asym = (1.0 / (ax * jnp.sqrt(jnp.pi))) * (
        1.0 - 0.5 / ax2 + 0.75 / (ax2 * ax2) - 1.875 / (ax2 * ax2 * ax2)
    )

    pos = jnp.where(ax > 10.0, asym, direct)

    # reflection for negative arguments; reference clamps x < -10 to +inf
    neg = 2.0 * jnp.exp(jnp.square(jnp.minimum(ax, 26.0))) - pos
    neg = jnp.where(x < -10.0, jnp.inf, neg)
    return jnp.where(x >= 0.0, pos, neg)


def normal_cdf(x):
    """Phi(x) = erfc(-x/sqrt(2))/2 (reference utilities.cpp:284-287)."""
    from jax.scipy.special import erfc

    return 0.5 * erfc(-jnp.asarray(x) * (1.0 / np.sqrt(2.0)))


def noise_prec_calc(snr: float, vars_, probs, mt: int, n: int) -> float:
    """gamw = SNR / (Mt * E[var]) (reference utilities.cpp:92-101)."""
    expe = float(np.dot(np.asarray(vars_), np.asarray(probs)))
    return snr / mt / expe


def calc_stdev(vec: np.ndarray) -> float:
    """Sample stdev with the (n-1) denominator (reference utilities.cpp:183-205)."""
    return float(np.std(np.asarray(vec), ddof=1))


def simulate_mixture(m: int, eta, pi, seed: int | None = None) -> np.ndarray:
    """Sample m values from a Gaussian mixture with variances `eta` and
    weights `pi`; a zero variance is a spike at 0
    (reference utilities.cpp:50-89, seeded instead of random_device)."""
    eta = np.asarray(eta, dtype=np.float64)
    pi = np.asarray(pi, dtype=np.float64)
    rng = np.random.default_rng(seed)
    comp = rng.choice(len(pi), size=m, p=pi / pi.sum())
    draws = rng.normal(0.0, 1.0, size=m) * np.sqrt(eta[comp])
    return np.where(eta[comp] == 0.0, 0.0, draws)
