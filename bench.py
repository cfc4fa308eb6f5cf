"""Benchmark: LMMSE normal-equation matvec throughput on the local chip.

The reference's per-CG-step cost is two full passes over the M×N design
matrix (data::Ax + data::ATx, ~16·M·N bytes at fp64 on CPU; SURVEY §3.2).
This measures our fused (tau·AᵀA + gam2·I)·v at the same algorithmic step,
in the TPU compute dtype, and reports achieved HBM GB/s.

vs_baseline = achieved GB/s / the chip's speed-of-light HBM bandwidth
(nominal per device kind, falling back to a measured copy probe).  The
reference publishes no numbers (BASELINE.md), so speed-of-light fraction is
the honest denominator.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def pick_shape(dtype) -> tuple[int, int]:
    """Target the large-scale workload shape (N~1e4, M~1e6) scaled to fit
    comfortably in one chip's HBM."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit", 16 * 2**30)
    except Exception:
        limit = 16 * 2**30
    budget = int(limit * 0.35)
    itemsize = jnp.dtype(dtype).itemsize
    n = 8192
    m = budget // (n * itemsize)
    m = int(min(m, 1_048_576)) // 1024 * 1024
    return max(m, 8192), n


def run(m: int, n: int, dtype):

    from vampomi_tpu.ops.operator import DesignMatrix, normal_eq_mult

    wd = jnp.float32 if dtype == jnp.bfloat16 else dtype
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (m, n), dtype=dtype)
    dm = DesignMatrix(
        X=X,
        mave=jnp.zeros(m, dtype=wd),
        msig=jnp.ones(m, dtype=wd),
        mmask=jnp.ones(m, dtype=wd),
        inv_sqrt_n=jnp.asarray(1.0 / np.sqrt(float(n)), dtype=wd),
        n=jnp.asarray(float(n), dtype=jnp.float64),
        mt=jnp.asarray(float(m), dtype=jnp.float64),
    )
    v = jax.random.normal(k2, (m,), dtype=wd)

    def sync(x):
        # block_until_ready is a no-op on the axon relay platform; a host
        # fetch of one element is the reliable fence.  (Single-element index,
        # NOT ravel — ravel materializes a full copy.)
        return float(jax.device_get(x[(0,) * x.ndim]))

    # Per-dispatch latency on this platform is ~5 ms, so the timed chain runs
    # INSIDE one jit via fori_loop — like a real CG solve does.
    iters = 20

    @jax.jit
    def chain(dm, v):
        def body(_, u):
            w = normal_eq_mult(dm, u, 1.7, 0.3)
            return w * jax.lax.rsqrt(jnp.sum(w * w))
        return jax.lax.fori_loop(0, iters, body, v)

    sync(chain(dm, v))  # compile + warm
    t0 = time.perf_counter()
    out = chain(dm, v)
    sync(out)
    dt = (time.perf_counter() - t0) / iters

    bytes_per_call = 2 * m * n * jnp.dtype(dtype).itemsize  # Ax + ATx passes
    gbps = bytes_per_call / dt / 1e9

    # speed-of-light proxy: elementwise scale of X (1 read + 1 write)
    @jax.jit
    def copy_chain(x):
        def body(_, u):
            return u * jnp.asarray(1.0000001, dtype=u.dtype)
        return jax.lax.fori_loop(0, 8, body, x)

    sync(copy_chain(X))
    t0 = time.perf_counter()
    c = copy_chain(X)
    sync(c)
    copy_dt = (time.perf_counter() - t0) / 8
    copy_gbps = (2 * m * n * jnp.dtype(dtype).itemsize) / copy_dt / 1e9

    return gbps, copy_gbps


_NOMINAL_HBM_GBPS = {
    # speed-of-light HBM bandwidth per chip generation (public specs)
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}


def nominal_hbm_gbps(copy_gbps: float) -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _NOMINAL_HBM_GBPS.items():
        if key in kind:
            return bw
    return copy_gbps  # unknown chip: fall back to the measured copy probe


def main() -> None:
    dtype = jnp.float32
    m, n = pick_shape(dtype)
    while True:
        try:
            gbps, copy_gbps = run(m, n, dtype)
            break
        except Exception as e:  # RESOURCE_EXHAUSTED → halve and retry
            if "RESOURCE_EXHAUSTED" not in str(e) or m <= 16384:
                raise
            m //= 2

    print(
        json.dumps(
            {
                "metric": "lmmse_matvec_gbps",
                "value": round(gbps, 2),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / nominal_hbm_gbps(copy_gbps), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
