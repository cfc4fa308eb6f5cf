"""Spike + Gaussian-mixture prior: MMSE denoisers and EM hyperparameter
updates, vectorized over (M, L).

Math follows the reference exactly, including its numerical stabilization:
the largest mixture variance ("eta_max") is factored out of every exponent so
arguments stay bounded where a naive form would overflow
(reference: src/vamp.cpp:440-492 g1/g1d, src/vamp.cpp:531-643 updatePrior).

Dynamic-shape policy: the reference erases merged mixture components from
std::vectors (src/vamp.cpp:627-642).  Under jit we keep a fixed component
count L with a boolean `active` mask; dead components carry prob = 0 and are
masked out of every sum and max.  The merge itself runs host-side on the tiny
(L,) arrays between iterations (`merge_components`).

Conventions: `vars` are the *internally scaled* variances (multiplied by N,
reference src/vamp.cpp:87-88); component 0 is the spike (vars[0] == 0 by
default) and is never merged away nor var-learned.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SIGMA_TINY = 1e-10  # reference: src/vamp.cpp:446 shortcut when 1/gam1 ~ 0


class MixturePrior(NamedTuple):
    """Pytree of mixture hyperparameters with a fixed max component count."""

    probs: jax.Array   # (L,) f64, dead slots 0
    vars: jax.Array    # (L,) f64, scaled by N
    active: jax.Array  # (L,) bool

    @property
    def L(self) -> int:
        return self.probs.shape[0]


def _eta_max(prior: MixturePrior) -> jax.Array:
    return jnp.max(jnp.where(prior.active, prior.vars, -jnp.inf))


def _component_terms(y: jax.Array, sigma, prior: MixturePrior):
    """z_j(y) = probs_j / sqrt(vars_j + sigma) * exp(stabilized exponent),
    masked to 0 for inactive components.  y: (M,), returns (M, L)."""
    eta_max = _eta_max(prior)
    v = prior.vars[None, :]
    y2 = (y * y)[:, None]
    expo = -0.5 * y2 * (eta_max - v) / (v + sigma) / (eta_max + sigma)
    z = prior.probs[None, :] / jnp.sqrt(v + sigma) * jnp.exp(expo)
    return jnp.where(prior.active[None, :], z, 0.0)


def g1(y: jax.Array, gam1, prior: MixturePrior) -> jax.Array:
    """MMSE posterior-mean denoiser (reference src/vamp.cpp:440-463),
    vectorized over y (M,)."""
    sigma = 1.0 / gam1
    z = _component_terms(y, sigma, prior)
    pk = jnp.sum(z, axis=1)
    pkd = -jnp.sum(z / (prior.vars[None, :] + sigma), axis=1) * y
    val = y + sigma * pkd / jnp.where(pk == 0.0, 1.0, pk)
    return jnp.where(jnp.abs(sigma) < _SIGMA_TINY, y, val)


def g1d(y: jax.Array, gam1, prior: MixturePrior) -> jax.Array:
    """Derivative of g1 (reference src/vamp.cpp:465-492)."""
    sigma = 1.0 / gam1
    v = prior.vars[None, :]
    z = _component_terms(y, sigma, prior)
    zv = z / (v + sigma)
    pk = jnp.sum(z, axis=1)
    pkd = -jnp.sum(zv, axis=1) * y
    # pkdd = sum_j [ z_j y^2 / (v_j+sigma)^2 - z_j / (v_j+sigma) ]
    pkdd = jnp.sum(zv / (v + sigma), axis=1) * (y * y) - jnp.sum(zv, axis=1)
    pk_safe = jnp.where(pk == 0.0, 1.0, pk)
    val = 1.0 + sigma * (pkdd / pk_safe - (pkd / pk_safe) ** 2)
    return jnp.where(jnp.abs(sigma) < _SIGMA_TINY, jnp.ones_like(y), val)


def em_update(
    r1: jax.Array,
    gam1,
    prior: MixturePrior,
    mmask: jax.Array,
    mt,
    *,
    em_max_iter,
    em_err_thr,
    learn_vars,
) -> MixturePrior:
    """One call of the reference's `updatePrior` EM loop
    (src/vamp.cpp:531-643, minus the merge step — see `merge_components`).

    Distributed: when r1 is sharded over the marker mesh axis, the per-marker
    sums below contract the sharded dim, so XLA inserts the same scalar
    all-reduces the reference issues via MPI_Allreduce (src/vamp.cpp:578,
    596-597).  Padding markers are excluded via `mmask`.
    """
    noise_var = 1.0 / gam1
    gam1 = jnp.asarray(gam1, dtype=jnp.float64)
    slab = jnp.logical_and(prior.active, jnp.arange(prior.L) >= 1)

    class EMState(NamedTuple):
        it: jax.Array
        probs: jax.Array
        vars: jax.Array
        done: jax.Array

    def body(s: EMState) -> EMState:
        probs, vars_ = s.probs, s.vars
        lam = 1.0 - probs[0]
        max_sigma = jnp.max(jnp.where(prior.active, vars_, -jnp.inf))

        v_col = vars_[None, :]
        r2_half = (r1 * r1)[:, None] * 0.5
        num = (
            probs[None, :]
            * jnp.exp(
                -r2_half * (max_sigma - v_col) / (v_col + noise_var) / (max_sigma + noise_var)
            )
            / jnp.sqrt(v_col + noise_var)
            / jnp.sqrt(2.0 * jnp.pi)
        )
        num = jnp.where(slab[None, :], num, 0.0)  # (M, L): slab responsibilities
        sum_num = jnp.sum(num, axis=1)
        sum_safe = jnp.where(sum_num == 0.0, 1.0, sum_num)
        beta = num / sum_safe[:, None]

        # pin_i: posterior inclusion probability of marker i
        spike_term = (
            (1.0 - lam)
            / jnp.sqrt(2.0 * jnp.pi * noise_var)
            * jnp.exp(-r2_half[:, 0] * max_sigma / noise_var / (noise_var + max_sigma))
        )
        pin = 1.0 / (1.0 + spike_term / sum_safe)
        pin = pin * mmask  # exclude padding markers from all sufficient stats

        lam_total = jnp.sum(pin)  # psum over the marker axis under jit
        lam_new = lam_total / mt

        gmean = gam1 * r1[:, None] / (1.0 / jnp.where(v_col == 0.0, 1.0, v_col) + gam1)
        v_post = 1.0 / (1.0 / jnp.where(vars_ == 0.0, 1.0, vars_) + gam1)
        gammas = beta * (gmean * gmean + v_post[None, :])

        res = jnp.sum(beta * pin[:, None], axis=0)          # (L,)
        res_gammas = jnp.sum(gammas * pin[:, None], axis=0)  # (L,)

        res_safe = jnp.where(res == 0.0, 1.0, res)
        new_vars = jnp.where(
            jnp.logical_and(slab, res != 0.0), res_gammas / res_safe, vars_
        )
        # learn_vars may be a traced bool; it gates the in-loop variance update
        # (reference src/vamp.cpp:598-599)
        vars_next = jnp.where(jnp.asarray(learn_vars), new_vars, vars_)
        omegas = jnp.where(slab, res / jnp.where(lam_total == 0.0, 1.0, lam_total), 0.0)
        probs_next = jnp.where(slab, lam_new * omegas, probs)
        probs_next = probs_next.at[0].set(1.0 - lam_new)
        probs_next = jnp.where(prior.active, probs_next, 0.0)

        def masked_rel_dist(a, b):
            d = jnp.sum(jnp.where(prior.active, (a - b) ** 2, 0.0))
            n = jnp.sum(jnp.where(prior.active, a * a, 0.0))
            return jnp.sqrt(d / jnp.where(n == 0.0, 1.0, n))

        dist_probs = masked_rel_dist(probs_next, probs)
        dist_vars = masked_rel_dist(vars_next, vars_)
        done = jnp.logical_and(dist_probs < em_err_thr, dist_vars < em_err_thr)

        return EMState(it=s.it + 1, probs=probs_next, vars=vars_next, done=done)

    def cond(s: EMState):
        return jnp.logical_and(s.it < em_max_iter, jnp.logical_not(s.done))

    init = EMState(
        it=jnp.asarray(0),
        probs=prior.probs,
        vars=prior.vars,
        done=jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)
    return MixturePrior(probs=out.probs, vars=out.vars, active=prior.active)


def merge_components(
    probs: np.ndarray, vars_: np.ndarray, active: np.ndarray, merge_vars_thr: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side merge of near-duplicate variance components
    (reference: src/vamp.cpp:627-642).  The reference erases vector entries;
    we zero the prob and clear the active flag so jit shapes stay static.
    Returns new (probs, vars, active) numpy arrays.
    """
    probs = np.array(probs, dtype=np.float64)
    vars_ = np.array(vars_, dtype=np.float64)
    active = np.array(active, dtype=bool)
    L = len(probs)
    for j in range(L):
        if not active[j]:
            continue
        for k in range(j + 1, L):
            if not active[k]:
                continue
            denom = min(vars_[j], vars_[k]) if vars_[j] != 0 else 1e-7
            if abs(vars_[j] - vars_[k]) / denom < merge_vars_thr:
                probs[j] += probs[k]
                probs[k] = 0.0
                active[k] = False
    return probs, vars_, active


def init_prior(probs, vars_, n_samples: int, l_max: int | None = None) -> MixturePrior:
    """Build a MixturePrior from CLI-style probs/vars (unscaled); variances
    are scaled by N internally (reference: src/vamp.cpp:87-88)."""
    probs = np.asarray(probs, dtype=np.float64)
    vars_ = np.asarray(vars_, dtype=np.float64) * float(n_samples)
    L = len(probs)
    assert len(vars_) == L, "probs and vars must have equal length"
    l_max = l_max or L
    p = np.zeros(l_max)
    v = np.zeros(l_max)
    a = np.zeros(l_max, dtype=bool)
    p[:L] = probs
    v[:L] = vars_
    a[:L] = True
    return MixturePrior(
        probs=jnp.asarray(p), vars=jnp.asarray(v), active=jnp.asarray(a)
    )
