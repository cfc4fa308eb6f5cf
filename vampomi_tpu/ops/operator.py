"""The standardized design-matrix operator A, TPU-first.

The reference never materializes the standardized matrix; it fuses
(X - mu) * sigma_inv into elementwise CPU loops inside `Ax`/`ATx`
(reference: src/data.cpp:294-373).  On TPU we instead use the algebraic
decomposition

    A x   = ( X^T (sigma_inv ∘ x) - (mu · (sigma_inv ∘ x)) 1 ) / sqrt(N)
    A^T y = sigma_inv ∘ ( X y - mu (1^T y) ) / sqrt(N)

so the hot path is a dense (M, N) matvec/matmul that XLA maps onto the MXU,
plus O(M)+O(N) rank-1 corrections on the VPU.  X is stored marker-major
(M, N) — the same layout as the input `.bin` file (reference:
simulation/data_sim.py:58) — and sharded over the mesh axis "m" in dim 0.

Communication: `A x` contracts the sharded M dim → XLA inserts one
all-reduce of an N-vector (== the reference's MPI_Allreduce(N),
src/data.cpp:367).  `A^T y` is communication-free (y replicated).

Precision: X is held in a compute dtype (f32 by default on TPU, f64 for the
CPU oracle; bf16 with f32 accumulation for max throughput).  All results are
returned as float64 scalars/vectors for the VAMP bookkeeping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..sharding import MARKER_AXIS, distribute, pad_to_multiple


class DesignMatrix(NamedTuple):
    """Pytree holding the raw data and the fused standardization vectors.

    Attributes
    ----------
    X     : (M_pad, N) raw marker data, compute dtype, sharded over "m".
    mave  : (M_pad,) per-marker mean (f64), sharded over "m".
    msig  : (M_pad,) per-marker inverse sd (or 1/sd^alpha), f64; ZERO for
            padding markers so padded columns of A are exactly 0.
    mmask : (M_pad,) 1.0 for real markers, 0.0 for padding (f64).
    n     : () number of samples as f64 scalar.
    mt    : () number of (true, unpadded) markers as f64 scalar.
    """

    X: jax.Array
    mave: jax.Array
    msig: jax.Array
    mmask: jax.Array
    n: jax.Array
    mt: jax.Array

    @property
    def m_pad(self) -> int:
        return self.X.shape[0]

    @property
    def n_samples(self) -> int:
        return self.X.shape[1]


def _cast_in(dm: DesignMatrix, v: jax.Array) -> jax.Array:
    return v.astype(dm.X.dtype)


def _accum_dtype(dm: DesignMatrix):
    # bf16 inputs accumulate in f32 on the MXU; f32/f64 accumulate natively.
    return jnp.float32 if dm.X.dtype == jnp.bfloat16 else dm.X.dtype


def ax(dm: DesignMatrix, x: jax.Array) -> jax.Array:
    """z = A x, with x of shape (..., M_pad) or (M_pad,). Returns f64 (N,).

    Matches reference `data::Ax` (src/data.cpp:340-373): per-marker
    (X_j - mu_j) * sigma_inv_j * x_j accumulated over markers, then / sqrt(N).
    """
    w = dm.msig * x  # f64 elementwise, sharded over m
    wc = _cast_in(dm, w)
    z = jnp.einsum(
        "m,mn->n", wc, dm.X, preferred_element_type=_accum_dtype(dm)
    ).astype(jnp.float64)
    corr = jnp.dot(dm.mave, w)  # scalar, f64
    return (z - corr) / jnp.sqrt(dm.n)


def atx(dm: DesignMatrix, y: jax.Array) -> jax.Array:
    """v = A^T y for y (N,). Returns f64 (M_pad,), padded entries exactly 0.

    Matches reference `data::ATx` (src/data.cpp:315-333).
    """
    yc = _cast_in(dm, y)
    xy = jnp.einsum(
        "mn,n->m", dm.X, yc, preferred_element_type=_accum_dtype(dm)
    ).astype(jnp.float64)
    v = dm.msig * (xy - dm.mave * jnp.sum(y))
    return v / jnp.sqrt(dm.n)


def ax_batch(dm: DesignMatrix, xs: jax.Array) -> jax.Array:
    """A @ xs for xs (M_pad, K) → (N, K). Shares the HBM pass over X across
    the K right-hand sides (the multi-RHS CG building block)."""
    w = dm.msig[:, None] * xs
    wc = _cast_in(dm, w)
    z = jnp.einsum(
        "mk,mn->nk", wc, dm.X, preferred_element_type=_accum_dtype(dm)
    ).astype(jnp.float64)
    corr = dm.mave @ w  # (K,)
    return (z - corr[None, :]) / jnp.sqrt(dm.n)


def atx_batch(dm: DesignMatrix, ys: jax.Array) -> jax.Array:
    """A^T @ ys for ys (N, K) → (M_pad, K)."""
    yc = _cast_in(dm, ys)
    xy = jnp.einsum(
        "mn,nk->mk", dm.X, yc, preferred_element_type=_accum_dtype(dm)
    ).astype(jnp.float64)
    v = dm.msig[:, None] * (xy - jnp.outer(dm.mave, jnp.sum(ys, axis=0)))
    return v / jnp.sqrt(dm.n)


def normal_eq_mult(dm: DesignMatrix, v: jax.Array, tau, gam2) -> jax.Array:
    """(tau · A^T A + gam2 · I) v — the LMMSE system operator.

    Reference `vamp::lmmse_mult` (src/vamp.cpp:645-662).  Accepts (M_pad,)
    or (M_pad, K); K right-hand sides share the two passes over X.
    """
    if v.ndim == 1:
        return tau * atx(dm, ax(dm, v)) + gam2 * v
    return tau * atx_batch(dm, ax_batch(dm, v)) + gam2 * v


def compute_marker_stats(
    X: jax.Array, n_used: int, alpha_scale: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """Per-marker mean and inverse-sd (1/sd or 1/sd^alpha).

    Matches reference `data::compute_markers_statistics`
    (src/data.cpp:233-283): sd uses the (nonas - 1) denominator; zero-variance
    markers get msig = 1.
    """
    Xf = X.astype(jnp.float64)
    mave = jnp.sum(Xf, axis=1) / n_used
    sumsqr = jnp.sum((Xf - mave[:, None]) ** 2, axis=1)
    sd = jnp.sqrt(sumsqr / (n_used - 1.0))
    inv = jnp.where(sumsqr != 0.0, 1.0 / jnp.where(sd == 0, 1.0, sd) ** alpha_scale, 1.0)
    return mave, inv


def build_design(
    X_raw: np.ndarray | jax.Array,
    mesh: Mesh | None = None,
    compute_dtype=jnp.float32,
    alpha_scale: float = 1.0,
    mt: int | None = None,
) -> DesignMatrix:
    """Construct a (optionally mesh-sharded) DesignMatrix from raw (Mt, N)
    marker-major data.

    Pads M up to a multiple of the mesh size; padded markers have msig = 0 and
    mmask = 0 so they contribute exactly nothing to any product or reduction.
    """
    X_raw = np.asarray(X_raw)
    Mt_true = int(mt if mt is not None else X_raw.shape[0])
    N = X_raw.shape[1]

    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    M_pad = pad_to_multiple(Mt_true, n_shards)

    Xp = np.zeros((M_pad, N), dtype=np.dtype(compute_dtype)) if M_pad != Mt_true else None
    if Xp is not None:
        Xp[:Mt_true] = np.asarray(X_raw, dtype=np.dtype(compute_dtype))
        X_host = Xp
    else:
        X_host = np.asarray(X_raw, dtype=np.dtype(compute_dtype))

    mmask_host = np.zeros((M_pad,), dtype=np.float64)
    mmask_host[:Mt_true] = 1.0

    if mesh is not None:
        X = distribute(X_host, mesh, P(MARKER_AXIS, None))
        mmask = distribute(mmask_host, mesh, P(MARKER_AXIS))
    else:
        X = jnp.asarray(X_host)
        mmask = jnp.asarray(mmask_host)

    # Stats in f64 from the raw (unpadded) data for bit-faithful
    # standardization even when X is stored narrow.
    stats_src = np.asarray(X_raw, dtype=np.float64)
    mave_host = np.zeros((M_pad,), dtype=np.float64)
    msig_host = np.zeros((M_pad,), dtype=np.float64)
    mave_host[:Mt_true] = stats_src.sum(axis=1) / N
    sumsqr = ((stats_src - mave_host[:Mt_true, None]) ** 2).sum(axis=1)
    with np.errstate(divide="ignore"):
        sd = np.sqrt(sumsqr / (N - 1.0))
        inv = np.where(sumsqr != 0.0, 1.0 / np.where(sd == 0, 1.0, sd) ** alpha_scale, 1.0)
    msig_host[:Mt_true] = inv

    if mesh is not None:
        mave = distribute(mave_host, mesh, P(MARKER_AXIS))
        msig = distribute(msig_host, mesh, P(MARKER_AXIS))
    else:
        mave = jnp.asarray(mave_host)
        msig = jnp.asarray(msig_host)

    return DesignMatrix(
        X=X,
        mave=mave,
        msig=msig,
        mmask=mmask,
        n=jnp.asarray(float(N), dtype=jnp.float64),
        mt=jnp.asarray(float(Mt_true), dtype=jnp.float64),
    )


def build_design_multihost(
    local_rows: np.ndarray,
    global_start: int,
    mt: int,
    m_pad: int,
    n: int,
    mesh: Mesh,
    compute_dtype,
    alpha_scale: float = 1.0,
) -> DesignMatrix:
    """Multi-host construction: each process contributes its contiguous block
    of padded marker rows (marker statistics are per-row, so no cross-host
    reduction is needed — N is always fully local, like the reference's
    data.cpp:295,342)."""
    from jax.sharding import NamedSharding

    per = local_rows.shape[0]
    idx = np.arange(global_start, global_start + per)
    real = idx < mt

    mave_l = np.where(real, local_rows.sum(axis=1) / n, 0.0)
    sumsqr = ((local_rows - mave_l[:, None]) ** 2).sum(axis=1)
    with np.errstate(divide="ignore"):
        sd = np.sqrt(sumsqr / (n - 1.0))
        inv = np.where(sumsqr != 0.0, 1.0 / np.where(sd == 0, 1.0, sd) ** alpha_scale, 1.0)
    msig_l = np.where(real, inv, 0.0)
    mmask_l = real.astype(np.float64)

    def g(local, spec, dtype):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(
            sh, np.asarray(local, dtype=dtype)
        )

    X = g(local_rows, P(MARKER_AXIS, None), np.dtype(compute_dtype))
    return DesignMatrix(
        X=X,
        mave=g(mave_l, P(MARKER_AXIS), np.float64),
        msig=g(msig_l, P(MARKER_AXIS), np.float64),
        mmask=g(mmask_l, P(MARKER_AXIS), np.float64),
        n=jnp.asarray(float(n), dtype=jnp.float64),
        mt=jnp.asarray(float(mt), dtype=jnp.float64),
    )
