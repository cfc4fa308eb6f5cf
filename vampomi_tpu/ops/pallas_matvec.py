"""Pallas TPU kernel for the int8 design-matrix A^T y matvec.

Round-2 measured hand-written Pallas kernels against the XLA einsum for
f32/bf16 X and deleted them (no win — the einsum already saturates HBM for
2- and 4-byte elements).  int8 X is different: XLA's reduce-over-lanes
matvec ("mn,n->m") through an int8->bf16 upcast reaches only ~479 GB/s at
M=2^20, N=10240 while the broadcast direction ("mk,mn->nk") reaches ~670,
and a raw int8 byte-stream floor measures ~540+ (tools/r4_probe.py).  A
Pallas kernel that streams (TM, N) int8 tiles through VMEM and does the
multiply-reduce on the VPU in f32 measures ~625 GB/s — ~30% faster than
the einsum — with relerr ~3e-7 vs the einsum route's ~1.6e-3 (the einsum
rounds the N-vector to bf16; here it stays f32).

Used by ops/operator.py `atx` for the A^T y direction when X is int8 on a
single TPU device and the shape tiles; everything else falls back to the
einsum (the `ax` direction stays on the einsum — already at the byte
floor).  The gate is static at trace time (backend + device count +
shape/dtype), so it composes with jit without inspecting tracer shardings;
multi-device meshes keep the einsum whose contraction XLA turns into the
mesh psum.

Reference mapping: this is the `data::ATx` hot loop (src/data.cpp:315-333),
the reduce-over-samples half of the north-star "LMMSE matvec GB/s/chip"
kernel (BASELINE.json).
"""

from __future__ import annotations

import functools
import sys
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# All pallas_calls below trace under `jax.enable_x64(False)`: with the
# package's global x64 mode the BlockSpec index maps trace to i64 returns,
# which the relay's 2026-08-18 Mosaic toolchain refuses to legalize
# ("func.return (i64, i64)", BENCH_r04 first attempt).  The kernels touch
# only f32/int8/uint8 values, so trace-time x64-off changes nothing but the
# index dtypes.

# (TM, N) int8 tile = TM*N bytes; TM=512 at N=10240 is 5.2 MB, double-
# buffered by the pipeline -> ~10.5 MB of the 16 MB scoped VMEM (TM=1024
# exceeds it — measured compile OOM).  TM=256 and 512 measure identically.
# The cap bounds the DOUBLE-BUFFERED footprint: 6 MB/tile -> 12 MB + the
# y/output blocks stays inside the 16 MB scoped VMEM (an 8 MB tile would
# double-buffer to the measured-OOM regime).
_TM = 512
_MAX_TILE_BYTES = 6 * 1024 * 1024


def _atx_kernel(y_ref, x_ref, o_ref):
    # VPU multiply-reduce in f32: int8 -> f32 upcast is exact, and the
    # N-vector is never rounded to bf16 (unlike the einsum fallback).
    xf = x_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.sum(xf * y_ref[:], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def atx_int8_raw(Xq: jax.Array, y: jax.Array, tm: int,
                 interpret: bool = False) -> jax.Array:
    """(M, N) int8 @ (N,) f32 -> (M,) f32, exact int8->f32 accumulation.

    `interpret=True` runs the kernel in the Pallas interpreter (any
    backend) so the CPU test suite can lock its numerics.
    """
    m, n = Xq.shape
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _atx_kernel,
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
            interpret=interpret,
        )(y.astype(jnp.float32).reshape(1, n), Xq)
    return out[:, 0]


def _atx_packed4_kernel(ylo_ref, yhi_ref, x_ref, o_ref):
    # unpack two 4-bit codes per byte on the VPU: low nibble = sample j,
    # high nibble = sample j + N/2, both biased by +8 (ops/operator.py
    # pack_nibbles_host); the int32 temps live only in VMEM for one tile
    p = x_ref[:].astype(jnp.int32)
    lo = ((p & 15) - 8).astype(jnp.float32)
    hi = ((p >> 4) - 8).astype(jnp.float32)
    o_ref[:] = jnp.sum(lo * ylo_ref[:] + hi * yhi_ref[:], axis=1,
                       keepdims=True)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def atx_packed4_raw(Xp: jax.Array, y: jax.Array, tm: int,
                    interpret: bool = False) -> jax.Array:
    """(M, N/2) packed-nibble bytes × (N,) f32 → (M,) f32, exact 4-bit
    code → f32 upcast.  One HBM pass over HALF the int8 byte count."""
    m, n2 = Xp.shape
    yf = y.astype(jnp.float32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _atx_packed4_kernel,
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
            interpret=interpret,
        )(yf[:n2].reshape(1, n2), yf[n2:].reshape(1, n2), Xp)
    return out[:, 0]


def _ax_batch_packed4_kernel(w_ref, x_ref, olo_ref, ohi_ref, *, mul_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        olo_ref[:] = jnp.zeros_like(olo_ref)
        ohi_ref[:] = jnp.zeros_like(ohi_ref)

    p = x_ref[:].astype(jnp.int32)
    lo = ((p & 15) - 8).astype(mul_dtype)
    hi = ((p >> 4) - 8).astype(mul_dtype)
    wb = w_ref[:].astype(mul_dtype)
    dn = (((1,), (0,)), ((), ()))
    olo_ref[:] += jax.lax.dot_general(
        wb, lo, dn, preferred_element_type=jnp.float32)
    ohi_ref[:] += jax.lax.dot_general(
        wb, hi, dn, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tmk", "interpret"))
def ax_batch_packed4_raw(Xp: jax.Array, w: jax.Array, tmk: tuple[int, int],
                         interpret: bool = False) -> jax.Array:
    """(M, N/2) packed bytes contracted with (M, K) weights → (N, K) f32.

    The weighted broadcast direction of the engine iteration (ax_batch K=2,
    engine/linear.py); codes unpack to bf16 (exact — 4-bit values) and hit
    the MXU, so the byte stream over X is HALF the int8 rate for the same
    marker count."""
    tm, k = tmk
    m, n2 = Xp.shape
    # bf16 multiplies on the real MXU (4-bit codes are exact there); the
    # CPU interpreter lacks bf16 dots, so interpret mode multiplies in f32
    mul = jnp.float32 if interpret else jnp.bfloat16
    with jax.enable_x64(False):
        lo, hi = pl.pallas_call(
            functools.partial(_ax_batch_packed4_kernel, mul_dtype=mul),
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((k, tm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((k, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((k, n2), jnp.float32),
                jax.ShapeDtypeStruct((k, n2), jnp.float32),
            ),
            interpret=interpret,
        )(w.T.reshape(k, m), Xp)
    return jnp.concatenate([lo, hi], axis=1).T  # (N, K)


def _atx_batch_packed4_kernel(ylo_ref, yhi_ref, x_ref, o_ref, *, mul_dtype):
    # reduce direction with K right-hand sides: unpack two 4-bit codes per
    # byte on the VPU (exact in bf16), contract (TM, N/2) x (N/2, K) on the
    # MXU with f32 accumulation.  X streams through VMEM tile-by-tile — the
    # bf16 halves NEVER materialize at full M (the einsum fallback's 2x-
    # bf16-X HBM cliff, round-3 review ask #8).
    p = x_ref[:].astype(jnp.int32)
    lo = ((p & 15) - 8).astype(mul_dtype)
    hi = ((p >> 4) - 8).astype(mul_dtype)
    dn = (((1,), (0,)), ((), ()))
    o_ref[:] = (
        jax.lax.dot_general(lo, ylo_ref[:].astype(mul_dtype), dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(hi, yhi_ref[:].astype(mul_dtype), dn,
                              preferred_element_type=jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("tmk", "interpret"))
def atx_batch_packed4_raw(Xp: jax.Array, ys: jax.Array, tmk: tuple[int, int],
                          interpret: bool = False) -> jax.Array:
    """(M, N/2) packed bytes × (N, K) f32 → (M, K) f32.

    The multi-RHS A^T direction (CG normal equations, probit LMMSE, the
    Onsager probe pair) on packed int4 without unpacking X in HBM: one
    half-byte-per-element pass.  Sample index j < N/2 is the byte's low
    nibble, j + N/2 the high nibble (ops/operator.py pack_nibbles_host)."""
    tm, k = tmk
    m, n2 = Xp.shape
    # bf16 code multiplies on the MXU (4-bit codes exact); interpret mode
    # (CPU tests) lacks bf16 dots, so it multiplies in f32
    mul = jnp.float32 if interpret else jnp.bfloat16
    yf = ys.astype(jnp.float32)
    # enable_x64(False) like every other pallas_call here: under the
    # package's global x64 the BlockSpec index maps trace to i64 returns,
    # which Mosaic refuses to legalize ("func.return (i64, i64)" — this
    # exact kernel killed the round-4/5 int4 probe on the chip; interpret
    # mode never exercises Mosaic, so only a real-TPU call could catch it)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_atx_batch_packed4_kernel, mul_dtype=mul),
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((n2, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
            interpret=interpret,
        )(yf[:n2], yf[n2:], Xp)
    return out


def pick_tile(m: int, n: int) -> int | None:
    """Largest tile (<= _TM rows, VMEM-safe) dividing m, or None if the
    shape doesn't tile (fallback to the einsum)."""
    tm = _TM
    while tm >= 8 and (m % tm != 0 or tm * n > _MAX_TILE_BYTES):
        tm //= 2
    return tm if tm >= 8 and m % tm == 0 and tm * n <= _MAX_TILE_BYTES else None


_TPU_BACKENDS = ("tpu", "axon")  # axon = relay-attached TPU: it registers
# its platform as "axon" but aliases the "tpu" MLIR lowering rules, so
# Pallas kernels compile and run on it (axon/register/pjrt.py
# canonical_platform).  Matching only "tpu" silently disabled the kernels
# on the production chip — the einsum fallback ran at 479 GB/s where the
# kernel measures 625.


def atx_applicable(dm) -> int | None:
    """The tile size when the Pallas path handles this DesignMatrix, else
    None.  Every condition is static at trace time: a quantized dtype
    (int8, or uint8 = packed int4), a single TPU device (multi-device
    meshes keep the einsum + psum route; the 8-device CPU test mesh never
    enters), and a tileable shape."""
    if dm.X.dtype not in (jnp.int8, jnp.uint8):
        return None
    if jax.default_backend() not in _TPU_BACKENDS or jax.device_count() != 1:
        return None
    return pick_tile(*dm.X.shape)


def ax_batch_packed4_applicable(dm, k: int) -> tuple[int, int] | None:
    """(tile, K) when the packed-int4 Pallas broadcast kernel applies.
    K is capped so the (K, tile) weight block and the two (K, N/2)
    accumulators stay a small fraction of VMEM; larger K (CG multi-RHS)
    falls back to the unpack-einsum route."""
    if dm.X.dtype != jnp.uint8 or k > 8:
        return None
    if jax.default_backend() not in _TPU_BACKENDS or jax.device_count() != 1:
        return None
    tm = pick_tile(*dm.X.shape)
    return (tm, k) if tm is not None else None


def atx_batch_packed4_applicable(dm, k: int) -> tuple[int, int] | None:
    """(tile, K) when the packed-int4 Pallas reduce-direction batch kernel
    applies — the same static gate as the broadcast kernel (the two (N/2, K)
    y-halves and the (tile, K) output block are small next to the X tile)."""
    return ax_batch_packed4_applicable(dm, k)
