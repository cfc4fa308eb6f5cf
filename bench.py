"""Benchmark: full VAMP iteration rate on the local chip.

Measures the framework's production path — one complete linear-gVAMP
iteration (mixture denoiser + EM-ready reductions + exact Gram/Woodbury
LMMSE solve + exact Onsager/noise traces + metrics; engine/linear.py
`_iteration_phase_spectral`) — at the largest marker count that fits the
chip's HBM with N = 8192 samples, i.e. the BASELINE.json north-star
workload shape ("VAMP iterations/s at N~1e4, M~1e6") scaled to one chip.

vs_baseline = (time of the reference-structured algorithm on the SAME
chip) / (our time).  The reference algorithm is Jacobi-preconditioned CG
at the reference's own defaults (CG_max_iter=500, tol=1e-5,
src/options.hpp:83-84) with warm start plus the Hutchinson Onsager/trace
probe — implemented as our `_iteration_phase`, whose matvec kernel already
runs at ~84% of HBM speed-of-light (see ops/operator.py).  So vs_baseline
is the honest per-iteration algorithmic speedup over the reference on
identical silicon; the reference itself publishes no numbers (BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def pick_shape(dtype, n=8192):
    """Largest M (multiple of 16384 — make_problem's RNG chunk) such that X
    fits the HBM budget next to
    the N^2 dense state: the f32 Gram K plus the fused factor pass's four
    N^2 f32 buffers (ops/spectral.py shift_inverse) plus the gram build's
    blocked f32 upcast transients.  bf16 X doubles the marker capacity —
    the north-star configuration (BASELINE.md: N~1e4, M~1e6)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit", 16 * 2**30)
    except Exception:
        limit = 16 * 2**30
    itemsize = jnp.dtype(dtype).itemsize
    budget = int(limit * 0.77) - 7 * n * n * 4
    m = max(budget // (n * itemsize), 16384) // 16384 * 16384
    return int(min(m, 1_048_576)), n


def make_problem(m, n, dtype):
    from vampomi_tpu.ops.operator import DesignMatrix
    from vampomi_tpu.prior.mixture import init_prior

    wd = jnp.float32 if dtype == jnp.bfloat16 else dtype
    key = jax.random.PRNGKey(0)
    kx, ky, kr = jax.random.split(key, 3)

    # generate X in marker chunks under lax.scan so the RNG's internal
    # full-precision transient never exceeds one chunk (a single
    # jax.random.normal at (m, n) would spike ~2x the X footprint)
    chunk = 16384
    assert m % chunk == 0 or m < chunk
    if m <= chunk:
        X = jax.random.normal(kx, (m, n), dtype=dtype)
    else:
        @jax.jit
        def gen(k):
            ks = jax.random.split(k, m // chunk)
            _, out = jax.lax.scan(
                lambda c, kk: (c, jax.random.normal(kk, (chunk, n), dtype=dtype)),
                0, ks,
            )
            return out.reshape(m, n)

        X = gen(kx)
    dm = DesignMatrix(
        X=X,
        mave=jnp.zeros(m, dtype=wd),
        msig=jnp.ones(m, dtype=wd),
        mmask=jnp.ones(m, dtype=wd),
        inv_sqrt_n=jnp.asarray(1.0 / np.sqrt(float(n)), dtype=wd),
        n=jnp.asarray(float(n), dtype=jnp.float64),
        mt=jnp.asarray(float(m), dtype=jnp.float64),
    )
    y = jax.random.normal(ky, (n,), dtype=wd)
    # mid-trajectory-like state: r1 = sparse-ish signal + noise, moderate gammas
    r1 = 0.3 * jax.random.normal(kr, (m,), dtype=wd)
    prior = init_prior([0.9, 0.07, 0.03], [0.0, 1e-3, 1e-2], n)
    return dm, y, r1, prior


def sync(x):
    # a host fetch of ONE element is the reliable fence on the relay platform
    # (block_until_ready is unreliable there; ravel would materialize a full
    # copy inside the timed window)
    return float(jax.device_get(x[(0,) * x.ndim]))


def time_calls(fn, k=5):
    sync(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / k


def run(m, n, dtype):
    from vampomi_tpu.engine.linear import (
        _iteration_phase, _iteration_phase_spectral,
    )
    from vampomi_tpu.ops.operator import atx, normal_eq_mult
    from vampomi_tpu.ops.spectral import build_spectral

    dm, y, r1, prior = make_problem(m, n, dtype)
    wd = dm.wd
    gam1 = jnp.asarray(1.0)
    gamw = jnp.asarray(10.0)
    rho = jnp.asarray(0.5)
    damp = jnp.asarray(False)
    ts = jnp.zeros(m, dtype=wd)
    x1_prev = jnp.zeros(m, dtype=wd)

    # ---- north-star metric: LMMSE matvec GB/s (one A^T A v = 2 passes) ----
    # dm must be an ARGUMENT, not a closure capture: captured operands lower
    # as multi-GB inline constants and overflow the remote-compile transport
    itemsize = jnp.dtype(dtype).itemsize
    nev = jax.jit(lambda d, v: normal_eq_mult(d, v, gamw, gam1))
    t_mv = time_calls(lambda: nev(dm, r1), k=10)
    log(f"LMMSE matvec (A^T A v): {t_mv*1e3:.2f} ms = "
        f"{2 * m * n * itemsize / t_mv / 1e9:.0f} GB/s over the "
        f"{jnp.dtype(dtype).name} X (2 HBM passes)")

    # ---- our path: exact Gram/Woodbury LMMSE ----
    t0 = time.perf_counter()
    fac = build_spectral(dm)
    jax.block_until_ready(fac.K)
    t_build = time.perf_counter() - t0
    aty = jax.jit(atx)(dm, y)

    def ours():
        return _iteration_phase_spectral(
            dm, fac, aty, y, r1, gam1, prior, x1_prev, damp, rho, gamw, ts,
        )["x1_hat"]

    t_ours = time_calls(ours)
    log(f"spectral: gram build {t_build:.2f}s (once per dataset), "
        f"iteration {t_ours*1e3:.1f} ms")

    # ---- reference-structured path: warm-started CG + Hutchinson probe ----
    key = jax.random.PRNGKey(1)
    bern = jax.random.rademacher(key, (m,), dtype=wd) / np.sqrt(float(m))
    cg_max = jnp.asarray(500)   # reference defaults, src/options.hpp:83-84
    # reference default tol is 1e-5 (src/options.hpp:84); bf16 operands floor
    # the achievable residual near 1e-3, so the baseline gets the benefit of
    # the doubt there (stops earlier than the reference's tolerance asks) —
    # vs_baseline is conservative at bf16
    cg_tol = jnp.asarray(1e-5 if dtype != jnp.bfloat16 else 1e-3)

    def ref_once(g1v, gwv, mu_warm):
        return _iteration_phase(
            dm, aty, y, r1, g1v, prior, x1_prev, damp, rho, gwv,
            mu_warm, bern, ts, cg_max, cg_tol,
        )

    # Warm start like a real run: the previous iteration solved the system at
    # slightly different gammas (src/vamp.cpp:308-311 reuses mu_CG_last across
    # iterations whose gam2/gamw have moved).  Warm-starting with the exact
    # solution of the SAME system would be unfairly fast for the baseline.
    prev = ref_once(gam1 * 1.15, gamw * 1.15, jnp.zeros(m, dtype=wd))
    mu_warm = prev["x2_hat"]

    def ref():
        return ref_once(gam1, gamw, mu_warm)["x1_hat"]

    t_ref = time_calls(ref, k=3)
    cg_iters = int(ref_once(gam1, gamw, mu_warm)["cg_iters"])
    log(f"cg (reference structure): iteration {t_ref*1e3:.1f} ms "
        f"({cg_iters} warm-started CG iters at tol {float(cg_tol):g})")

    return t_ours, t_ref, t_build


def main() -> None:
    # bf16 X (vectors f32) is the production configuration: 2 bytes/element
    # doubles markers/chip at the same HBM-bound rate.  bf16-vs-f32
    # trajectory accuracy on this chip is recorded in BF16_ACCURACY.json
    # (tools/bf16_accuracy.py).  Override with VAMPOMI_BENCH_DTYPE=float32.
    import os

    dtype = jnp.bfloat16
    if os.environ.get("VAMPOMI_BENCH_DTYPE") == "float32":
        dtype = jnp.float32
    m, n = pick_shape(dtype)
    while True:
        try:
            t_ours, t_ref, t_build = run(m, n, dtype)
            break
        except Exception as e:  # RESOURCE_EXHAUSTED -> back off and retry
            if "RESOURCE_EXHAUSTED" not in str(e) or m <= 16384:
                raise
            # back off by 64k markers per retry (fine steps near the HBM
            # ceiling; each retry pays full recompiles, so the 0.77 budget
            # heuristic is tuned to need at most one)
            m = max(m - 4 * 16384, 16384)
            log(f"OOM; retrying with M={m}")

    log(f"shape: M={m}, N={n}, dtype={jnp.dtype(dtype).name}; "
        f"X = {m*n*jnp.dtype(dtype).itemsize/2**30:.2f} GiB")
    print(
        json.dumps(
            {
                "metric": "vamp_iter_per_s",
                "value": round(1.0 / t_ours, 3),
                "unit": f"full VAMP iterations/s at M={m}, N={n}",
                "vs_baseline": round(t_ref / t_ours, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
