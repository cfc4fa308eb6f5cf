"""Pallas TPU kernels for the fused standardize-matvec hot path.

The design operator is A = (X - 1 mu^T) diag(msig) / sqrt(N) with X stored
marker-major (M, N) (reference fuses standardization into CPU loops,
src/data.cpp:294-373; ops/operator.py fuses it into XLA einsums + rank-1
corrections).  These kernels implement the same two contractions as single
Pallas programs so the X tile is read from HBM exactly once per pass with
the standardization applied in VMEM:

  atx:  v[m] = msig[m] * ( X[m,:] @ y  -  mave[m] * sum(y) ) / sqrt(N)
  ax:   z[n] = ( w @ X[:,n] - (mave @ w) ) / sqrt(N),  w = msig * x

Both are HBM-bandwidth-bound; the grid walks M tiles and Pallas
double-buffers the (TM, N) X tile DMA against the compute automatically
(sequential grid on TPU).  `ax` accumulates the (1, N) partial in a VMEM
scratch across grid steps and writes it once at the end.

These kernels exist as a measured alternative to the XLA einsum path (which
already reaches ~84% of HBM speed-of-light on the target chip); the
operator selects whichever is faster per platform via VAMPOMI_PALLAS=1.
Used only on TPU for f32/bf16 — the f64 CPU oracle path always takes the
einsum route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_m(m: int, n: int, itemsize: int, budget_bytes: int = 5 * 2**20) -> int:
    """Largest power-of-two marker tile whose (TM, N) block fits the VMEM
    budget (double buffering costs 2x this)."""
    tm = 1024
    while tm > 8 and tm * n * itemsize > budget_bytes:
        tm //= 2
    while m % tm:
        tm //= 2
    return max(tm, 1)


def _atx_kernel(x_ref, y_ref, mave_ref, msig_ref, sums_ref, out_ref):
    # one (TM, N) tile of X against the replicated y; standardization fused.
    # Broadcast-multiply + row reduce on the VPU — the op is HBM-bound, so
    # the skinny matrix-vector shape gains nothing from the MXU.
    acc = jnp.float32 if x_ref.dtype == jnp.bfloat16 else x_ref.dtype
    xy = jnp.sum(
        x_ref[:].astype(acc) * y_ref[:].astype(acc), axis=1, keepdims=True
    )  # (TM, 1)
    out_ref[:] = msig_ref[:] * (xy - mave_ref[:] * sums_ref[0, 0])


def atx_pallas(X, y, mave, msig, inv_sqrt_n):
    """v = A^T y, (M,) in the work dtype. Shard-local arrays only."""
    m, n = X.shape
    wd = jnp.float32 if X.dtype == jnp.bfloat16 else X.dtype
    tm = _pick_tile_m(m, n, jnp.dtype(X.dtype).itemsize)
    yc = y.astype(wd)
    sums = jnp.sum(yc).reshape(1, 1)

    # Mosaic cannot legalize the i64 index/arg types that jax_enable_x64
    # (on globally for f64 scalar bookkeeping, vampomi_tpu/__init__.py)
    # injects — scope it off around the kernel; all operands are <= f32.
    with jax.enable_x64(False):
        out = _atx_call(X, yc, mave, msig, tm)
    return out[:, 0] * jnp.asarray(inv_sqrt_n, dtype=wd)


def _atx_call(X, yc, mave, msig, tm):
    m, n = X.shape
    wd = jnp.float32 if X.dtype == jnp.bfloat16 else X.dtype
    sums = jnp.sum(yc).reshape(1, 1)
    return pl.pallas_call(
        _atx_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), wd),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n,
            bytes_accessed=m * n * jnp.dtype(X.dtype).itemsize,
            transcendentals=0,
        ),
    )(
        X,
        yc.astype(X.dtype).reshape(1, n),
        mave.astype(wd).reshape(m, 1),
        msig.astype(wd).reshape(m, 1),
        sums.astype(wd),
    )


def _ax_kernel(w_ref, x_ref, corr_ref, out_ref, acc_ref):
    # accumulate sum_m w[m] * X[m,:] into a VMEM scratch across the M grid
    i = pl.program_id(0)
    acc = jnp.float32 if x_ref.dtype == jnp.bfloat16 else x_ref.dtype
    part = jnp.sum(
        w_ref[:].astype(acc) * x_ref[:].astype(acc), axis=0, keepdims=True
    )  # (1, N)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = part - corr_ref[0, 0]

    @pl.when(i > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def ax_pallas(X, x, mave, msig, inv_sqrt_n):
    """z = A x, (N,) in the work dtype. Shard-local arrays only."""
    m, n = X.shape
    wd = jnp.float32 if X.dtype == jnp.bfloat16 else X.dtype
    tm = _pick_tile_m(m, n, jnp.dtype(X.dtype).itemsize)
    with jax.enable_x64(False):
        out = _ax_call(X, x.astype(wd), mave, msig, tm)
    return out[0] * jnp.asarray(inv_sqrt_n, dtype=wd)


def _ax_call(X, xc, mave, msig, tm):
    m, n = X.shape
    wd = jnp.float32 if X.dtype == jnp.bfloat16 else X.dtype
    w = (msig.astype(wd) * xc)
    corr = jnp.dot(mave.astype(wd), w).reshape(1, 1)

    return pl.pallas_call(
        _ax_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), wd),
        scratch_shapes=[pltpu.VMEM((1, n), wd)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n,
            bytes_accessed=m * n * jnp.dtype(X.dtype).itemsize,
            transcendentals=0,
        ),
    )(
        w.astype(X.dtype).reshape(m, 1),
        X,
        corr,
    )
