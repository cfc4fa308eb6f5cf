"""Benchmark: full VAMP iteration rate on the local chip.

Measures the framework's production path — one complete linear-gVAMP
iteration (mixture denoiser + EM-ready reductions + exact LMMSE solve +
exact Onsager/noise traces + metrics) — at the LITERAL north-star workload
shape (BASELINE.json: "VAMP iterations/s at N~1e4, M~1e6"):

    M >= 1e6 markers x N = 10240 samples on one chip, int8 design matrix
    (per-marker affine quantization, ops/operator.py quantize_markers —
    1 byte/element; f32 would need 40 GB, bf16 20 GB, int8 ~10 GB of HBM),
    eigen-LMMSE solver (ops/eigen.py: once-per-dataset diagonalization of
    the Gram matrix; per-iteration dense work is two N^2 matvecs).

vs_baseline = (time of the reference-structured algorithm on the SAME
chip) / (our time).  The reference algorithm is Jacobi-preconditioned CG
at the reference's defaults (CG_max_iter=500, src/options.hpp:83-84) with
warm start plus the Hutchinson Onsager/trace probe — implemented as our
`_iteration_phase`, whose matvec kernel runs at HBM speed-of-light
fractions (ops/operator.py).  The narrow-int8 operands floor the CG
residual near 1e-3, so the baseline stops at tol 1e-3 (earlier than the
reference's 1e-5 asks — vs_baseline is conservative).  The reference
itself publishes no numbers (BASELINE.md).

Prints ONE json line:
  {"metric", "value", "unit", "vs_baseline", "matvec_gbps", "dense_ms"}
matvec_gbps is the BASELINE.json "LMMSE matvec GB/s/chip" north star
(bytes of X read per wall second during one A^T A v);  dense_ms is the
per-iteration dense (non-X) cost — the term that caps multi-chip scaling
(SCALING.md).

Env overrides: VAMPOMI_BENCH_DTYPE=float32|bfloat16 runs the r01/r02-
comparable configuration (N=8192, spectral per-iteration factor) so the
cross-round series stays interpretable; BENCH_F32_COMPANION.json records
one such run per round.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def pick_shape(dtype):
    """Largest M (multiple of 16384 — make_problem's RNG chunk) such that X
    plus the dense state (K, U, and the eigen build's ~5 N^2 f32
    transients) fits HBM.  int8 X at N=10240 reaches the literal
    north-star M >= 1e6 on a single 16 GB chip."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit", 16 * 2**30)
    except Exception:
        limit = 16 * 2**30
    itemsize = jnp.dtype(dtype).itemsize
    if dtype == jnp.uint8:  # packed int4: two codes per byte
        n = 10240
        budget = int(limit) - int(6.4e9)
        m = max(budget // (n // 2), 16384) // 16384 * 16384
        # 2x the int8 marker capacity at the same byte budget
        return int(min(m, 2_097_152)), n
    if dtype == jnp.int8:
        n = 10240
        # K + U + the eigen build's sign/subspace transients peak at
        # ~2.2 GB; X = 12.6 GB measured OOM (allocator headroom), X = 10.4
        # GB runs — budget 6.4 GB of non-X overhead
        budget = int(limit) - int(6.4e9)
    else:
        n = 8192
        budget = int(limit * 0.77) - 7 * n * n * 4
    m = max(budget // (n * itemsize), 16384) // 16384 * 16384
    return int(min(m, 1_310_720)), n


def gen_x(m, n, dtype):
    """Deterministic synthetic X — callable twice to REGENERATE the matrix
    bit-identically after it was freed to make HBM room for the eigen
    build (cheaper than holding 10+ GB through a dense build, and the
    relay's ~20 MB/s fetch rules out a host round-trip).

    Chunked under lax.scan so the RNG's internal full-precision transient
    never exceeds one chunk (a single jax.random call at (m, n) would
    spike ~4x the int8 X footprint)."""
    chunk = 16384
    assert m % chunk == 0 or m < chunk
    kx = jax.random.split(jax.random.PRNGKey(0), 3)[0]

    def gen_chunk(kk):
        if dtype == jnp.uint8:
            # packed int4: uniform random bytes = two independent uniform
            # nibbles per byte (codes uniform over [-8, 7] after unbias)
            return jax.random.randint(
                kk, (chunk, n // 2), 0, 256, dtype=jnp.uint8
            )
        if dtype == jnp.int8:
            # synthetic already-quantized codes (uniform over the affine
            # range); msig folds the 1/sd like quantize_markers does
            return jax.random.randint(kk, (chunk, n), -127, 128, dtype=jnp.int8)
        return jax.random.normal(kk, (chunk, n), dtype=dtype)

    cols = n // 2 if dtype == jnp.uint8 else n
    if m <= chunk:
        return gen_chunk(kx)[:m]

    @jax.jit
    def gen(k):
        ks = jax.random.split(k, m // chunk)
        _, out = jax.lax.scan(lambda c, kk: (c, gen_chunk(kk)), 0, ks)
        return out.reshape(m, cols)

    return gen(kx)


def make_problem(m, n, dtype):
    from vampomi_tpu.ops.operator import DesignMatrix
    from vampomi_tpu.prior.mixture import init_prior

    wd = jnp.float32 if dtype in (jnp.bfloat16, jnp.int8, jnp.uint8) else dtype
    key = jax.random.PRNGKey(0)
    _, ky, kr = jax.random.split(key, 3)

    X = gen_x(m, n, dtype)
    # per-marker inverse sd of the uniform synthetic codes:
    # int8 range 255, int4 range 15 -> sd = range/sqrt(12)
    sig = {jnp.dtype(jnp.int8): np.sqrt(12.0) / 255.0,
           jnp.dtype(jnp.uint8): np.sqrt(12.0) / 15.0}.get(jnp.dtype(dtype), 1.0)
    dm = DesignMatrix(
        X=X,
        mave=jnp.zeros(m, dtype=wd),
        msig=jnp.full((m,), sig, dtype=wd),
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
        _iteration_phase, _iteration_phase_eigen, _iteration_phase_spectral,
    )
    from vampomi_tpu.ops.operator import atx, normal_eq_mult
    from vampomi_tpu.ops.spectral import build_spectral

    solver = "eigen" if dtype in (jnp.int8, jnp.uint8) else "spectral"
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
    itemsize = 0.5 if dtype == jnp.uint8 else jnp.dtype(dtype).itemsize
    nev = jax.jit(lambda d, v: normal_eq_mult(d, v, gamw, gam1))
    t_mv = time_calls(lambda: nev(dm, r1), k=10)
    matvec_gbps = 2 * m * n * itemsize / t_mv / 1e9
    log(f"LMMSE matvec (A^T A v): {t_mv*1e3:.2f} ms = "
        f"{matvec_gbps:.0f} GB/s over the "
        f"{jnp.dtype(dtype).name} X (2 HBM passes)")

    # ---- our path: exact LMMSE via the Gram eigenbasis (or factor) ----
    t0 = time.perf_counter()
    fac = build_spectral(dm)
    jax.block_until_ready(fac.K)
    t_build = time.perf_counter() - t0
    log(f"gram build: {t_build:.2f}s (once per dataset)")
    aty = jax.jit(atx)(dm, y)

    if solver == "eigen":
        from vampomi_tpu.ops.eigen import build_eigen_cached, eigen_weights

        # free X for the duration of the dense build (the build needs only
        # K); regenerate it bit-identically afterwards.  Holding a 10+ GB X
        # next to the build's N^2 transients measured an HBM OOM at the
        # assembly stage.
        placeholder = jnp.zeros(
            (16384, n // 2 if dtype == jnp.uint8 else n), dtype=dtype)
        dm = dm._replace(X=placeholder)
        import gc

        gc.collect()

        # factor persists across bench invocations (X is PRNG-regenerated,
        # so K is deterministic per (m, n, dtype) and the fingerprint
        # validates the reload); a repeated driver run skips the build
        cache = os.path.join(
            tempfile.gettempdir(),
            f"vampomi_bench_eigen_{os.getuid()}_{m}_{n}_{np.dtype(dtype).name}.npz")
        t0 = time.perf_counter()
        ef, diag = build_eigen_cached(fac, cache, verbose=True)
        sync(ef.U)
        t_eig = time.perf_counter() - t0
        log(f"eigen {'load' if diag.get('loaded') else 'build'}: "
            f"{t_eig:.1f}s (once per dataset; residual "
            f"{diag['resid']:.2e}, ortho {diag['ortho']:.2e})")
        if diag["resid"] > 1e-3:
            raise RuntimeError(f"eigen residual {diag['resid']} out of spec")
        del fac
        dm = dm._replace(X=gen_x(m, n, dtype))

        # dense_ms: the per-iteration non-X dense work in isolation
        @jax.jit
        def dense_piece(efv, vv, t, g):
            d, T = eigen_weights(efv, t, g)
            with jax.default_matmul_precision("highest"):
                q = efv.U @ (d.astype(jnp.float32) * (efv.U.T @ vv))
            return q, T

        t_dense = time_calls(lambda: dense_piece(ef, y, gamw, gam1)[0], k=10)
        log(f"eigen dense piece (2 N^2 matvecs + traces): {t_dense*1e3:.2f} ms")

        def ours():
            return _iteration_phase_eigen(
                dm, ef, aty, y, r1, gam1, prior, x1_prev, damp, rho, gamw, ts,
            )["x1_hat"]
    else:
        from vampomi_tpu.ops.spectral import default_nb, shift_inverse

        @jax.jit
        def dense_piece(fv, t, g):
            winv = shift_inverse(fv, t, g, nb=default_nb(n))
            return winv.W

        t_dense = time_calls(lambda: dense_piece(fac, gamw, gam1), k=5)
        log(f"factor dense piece (shift_inverse): {t_dense*1e3:.2f} ms")

        def ours():
            return _iteration_phase_spectral(
                dm, fac, aty, y, r1, gam1, prior, x1_prev, damp, rho, gamw, ts,
            )["x1_hat"]

    t_ours = time_calls(ours)
    log(f"{solver}: iteration {t_ours*1e3:.1f} ms")

    # ---- reference-structured path: warm-started CG + Hutchinson probe ----
    key = jax.random.PRNGKey(1)
    bern = jax.random.rademacher(key, (m,), dtype=wd) / np.sqrt(float(m))
    cg_max = jnp.asarray(500)   # reference defaults, src/options.hpp:83-84
    # reference default tol is 1e-5 (src/options.hpp:84); narrow (bf16/int8)
    # operands floor the achievable residual near 1e-3, so the baseline gets
    # the benefit of the doubt there (stops earlier than the reference's
    # tolerance asks) — vs_baseline is conservative
    cg_tol = jnp.asarray(1e-5 if dtype == jnp.float32 else 1e-3)

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

    return t_ours, t_ref, matvec_gbps, t_dense


def main() -> None:
    # int8 X (vectors f32) is the capacity configuration: 1 byte/element
    # reaches the literal north-star M >= 1e6 x N >= 1e4 on one chip.
    # Trajectory accuracy vs f32 on this chip is recorded in
    # INT8_ACCURACY.json (tools/int8_accuracy.py); bf16's in
    # BF16_ACCURACY.json.  Override with VAMPOMI_BENCH_DTYPE.
    dtype = {
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
        "int8": jnp.int8,
        # packed int4 (two codes/byte): the M ~ 2e6 capacity configuration
        "int4": jnp.uint8,
    }.get(os.environ.get("VAMPOMI_BENCH_DTYPE", "int8"), jnp.int8)
    m, n = pick_shape(dtype)
    # debug escape: VAMPOMI_BENCH_SHAPE=M,N runs an arbitrary (small) shape
    # so the bench path itself can be smoke-tested off-TPU
    shape_env = os.environ.get("VAMPOMI_BENCH_SHAPE", "")
    if shape_env:
        m, n = (int(v) for v in shape_env.split(","))
    while True:
        try:
            t_ours, t_ref, matvec_gbps, t_dense = run(m, n, dtype)
            break
        except Exception as e:  # RESOURCE_EXHAUSTED -> back off and retry
            if "RESOURCE_EXHAUSTED" not in str(e) or m <= 16384:
                raise
            # back off by 64k markers per retry (fine steps near the HBM
            # ceiling; each retry pays full recompiles, so the budget
            # heuristic is tuned to need at most one)
            m = max(m - 4 * 16384, 16384)
            log(f"OOM; retrying with M={m}")
            # the failed attempt's device buffers are pinned by the
            # exception's traceback frames until GC breaks the cycles —
            # without this every retry OOMs instantly (measured)
            import gc

            e = None
            gc.collect()
            time.sleep(3.0)

    xbytes = m * n * (0.5 if dtype == jnp.uint8 else jnp.dtype(dtype).itemsize)
    name = "int4(packed)" if dtype == jnp.uint8 else jnp.dtype(dtype).name
    log(f"shape: M={m}, N={n}, dtype={name}; X = {xbytes/2**30:.2f} GiB")
    print(
        json.dumps(
            {
                "metric": "vamp_iter_per_s",
                "value": round(1.0 / t_ours, 3),
                "unit": f"full VAMP iterations/s at M={m}, N={n}, {name}",
                "vs_baseline": round(t_ref / t_ours, 3),
                "matvec_gbps": round(matvec_gbps, 1),
                "dense_ms": round(t_dense * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
