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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (TM, N) int8 tile = TM*N bytes; TM=512 at N=10240 is 5.2 MB, double-
# buffered by the pipeline -> ~10.5 MB of the 16 MB scoped VMEM (TM=1024
# exceeds it — measured compile OOM).  TM=256 and 512 measure identically.
_TM = 512
_MAX_TILE_BYTES = 8 * 1024 * 1024


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
    out = pl.pallas_call(
        _atx_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        interpret=interpret,
    )(y.astype(jnp.float32).reshape(1, n), Xq)
    return out[:, 0]


def pick_tile(m: int, n: int) -> int | None:
    """Largest tile (<= _TM rows, VMEM-safe) dividing m, or None if the
    shape doesn't tile (fallback to the einsum)."""
    tm = _TM
    while tm >= 8 and (m % tm != 0 or tm * n > _MAX_TILE_BYTES):
        tm //= 2
    return tm if tm >= 8 and m % tm == 0 and tm * n <= _MAX_TILE_BYTES else None


def atx_applicable(dm) -> int | None:
    """The tile size when the Pallas path handles this DesignMatrix, else
    None.  Every condition is static at trace time: int8 dtype, a single
    TPU device (multi-device meshes keep the einsum + psum route; the
    8-device CPU test mesh never enters), and a tileable shape."""
    if dm.X.dtype != jnp.int8:
        return None
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return None
    return pick_tile(*dm.X.shape)
