"""Round-3b probes: can Pallas beat XLA's int8 matvec, and does packed int4 pay?

Context: the north-star bench iteration is exactly 2 HBM passes over X
(engine/linear.py _iteration_phase_eigen: ax_batch K=2 + atx).  Probe 1
measured at M=524288, N=10240:
    atx einsum int8->bf16   13.93 ms = 385 GB/s   <- the weak direction
    ax  einsum int8->bf16    9.93 ms = 541 GB/s
    raw int8 read floor      9.97 ms = 538 GB/s   <- int8 byte-stream ceiling
    atx pallas MXU          14.40 ms = 373 GB/s  (narrow-operand penalty)
    atx pallas VPU f32      10.67 ms = 503 GB/s  relerr 5e-7  <- beats XLA 30%
    ax  pallas MXU          10.36 ms = 518 GB/s
This probe: (a) full north-star M, k=20 reps (relay variance is +-30%);
(b) the engine's actual ax_batch K=2 shape; (c) packed int4 (2 nibbles/byte,
correctness at small M, timing at full M).

Run: python tools/r4_probe.py  (on the axon TPU)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    x = jax.tree.leaves(x)[0]
    return float(jax.device_get(x.ravel()[0] if x.ndim else x))


def timeit(fn, k=20):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / k


M, N = 1048576, 10240
TM = 512
N2 = N // 2


# ---------------------------------------------------------------- int8 kernels
def _atx_i8_vpu_kernel(y_ref, x_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.sum(xf * y_ref[:], axis=1, keepdims=True)


def atx_i8_vpu_call(Xq, y, tm):
    m = Xq.shape[0]
    yr = y.reshape(1, N)
    out = pl.pallas_call(
        _atx_i8_vpu_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
    )(yr, Xq)
    return out[:, 0]


atx_i8_vpu = jax.jit(atx_i8_vpu_call, static_argnums=2)


def _ax2_i8_kernel(w_ref, x_ref, o_ref):
    # accumulate o (2, N) += w_tile (2, TM) @ x_tile (TM, N) -- engine K=2
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xb = x_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jax.lax.dot_general(
        w_ref[:].astype(jnp.bfloat16), xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@jax.jit
def ax2_i8_pallas(Xq, W):
    m = Xq.shape[0]
    out = pl.pallas_call(
        _ax2_i8_kernel,
        grid=(m // TM,),
        in_specs=[
            pl.BlockSpec((2, TM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, N), jnp.float32),
    )(W.T.reshape(2, m), Xq)
    return out


# ---------------------------------------------------------------- int4 packed
# Byte (m, j) holds two biased nibbles: lo = code of sample j, hi = code of
# sample j + N/2; codes in [-8, 7] stored as code+8 in [0, 15].
def _atx_i4_vpu_kernel(ylo_ref, yhi_ref, x_ref, o_ref):
    p = x_ref[:].astype(jnp.int32)
    lo = ((p & 15) - 8).astype(jnp.float32)
    hi = (((p >> 4) & 15) - 8).astype(jnp.float32)
    o_ref[:] = jnp.sum(lo * ylo_ref[:] + hi * yhi_ref[:], axis=1,
                       keepdims=True)


def atx_i4_vpu_call(Xp, y, tm):
    m = Xp.shape[0]
    ylo = y[:N2].reshape(1, N2)
    yhi = y[N2:].reshape(1, N2)
    out = pl.pallas_call(
        _atx_i4_vpu_kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, N2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
    )(ylo, yhi, Xp)
    return out[:, 0]


atx_i4_vpu = jax.jit(atx_i4_vpu_call, static_argnums=2)


def _ax2_i4_kernel(w_ref, x_ref, olo_ref, ohi_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        olo_ref[:] = jnp.zeros_like(olo_ref)
        ohi_ref[:] = jnp.zeros_like(ohi_ref)

    p = x_ref[:].astype(jnp.int32)
    lo = ((p & 15) - 8).astype(jnp.bfloat16)
    hi = (((p >> 4) & 15) - 8).astype(jnp.bfloat16)
    wb = w_ref[:].astype(jnp.bfloat16)
    olo_ref[:] += jax.lax.dot_general(
        wb, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    ohi_ref[:] += jax.lax.dot_general(
        wb, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


@jax.jit
def ax2_i4_pallas(Xp, W):
    m = Xp.shape[0]
    lo, hi = pl.pallas_call(
        _ax2_i4_kernel,
        grid=(m // TM,),
        in_specs=[
            pl.BlockSpec((2, TM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, N2), jnp.float32),
            jax.ShapeDtypeStruct((2, N2), jnp.float32),
        ),
    )(W.T.reshape(2, m), Xp)
    return jnp.concatenate([lo, hi], axis=1)  # (2, N)


def gen_int8(k, m, lo, hix):
    chunk = 16384

    @jax.jit
    def gen(kk):
        ks = jax.random.split(kk, m // chunk)
        _, out = jax.lax.scan(
            lambda c, k2: (c, jax.random.randint(
                k2, (chunk, N), lo, hix, dtype=jnp.int8)),
            0, ks)
        return out.reshape(m, N)

    return gen(k)


@jax.jit
def pack_nibbles(Xn):
    lo = Xn[:, :N2].astype(jnp.uint8)
    hi = Xn[:, N2:].astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.int8)


def main():
    key = jax.random.PRNGKey(0)
    kx, kw, kv = jax.random.split(key, 3)

    w = jax.random.normal(kw, (M,), dtype=jnp.float32)
    W2 = jax.random.normal(kw, (M, 2), dtype=jnp.float32)
    y = jax.random.normal(kv, (N,), dtype=jnp.float32)
    GB = M * N / 1e9

    # ---- correctness at small M (both int8 pallas and int4 pallas) ----
    ms = 65536
    Xs = gen_int8(kx, ms, -127, 128)
    ref = np.asarray(jnp.einsum("mn,n->m", Xs.astype(jnp.float32), y,
                                precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(atx_i8_vpu(Xs, y, TM))
    log(f"atx_i8_vpu correctness: relerr="
        f"{np.max(np.abs(got - ref)) / np.max(np.abs(ref)):.2e}")
    Xsn = gen_int8(kx, ms, 0, 16)
    Xsp = pack_nibbles(Xsn)
    Xsu = jnp.concatenate([Xsn[:, :N2], Xsn[:, N2:]], axis=1) - 8
    ref4 = np.asarray(jnp.einsum("mn,n->m", Xsu.astype(jnp.float32), y,
                                 precision=jax.lax.Precision.HIGHEST))
    got4 = np.asarray(atx_i4_vpu(Xsp, y, TM))
    log(f"atx_i4_vpu correctness: relerr="
        f"{np.max(np.abs(got4 - ref4)) / np.max(np.abs(ref4)):.2e}")
    ref4b = np.asarray(jnp.einsum("mk,mn->kn", W2[:ms].astype(jnp.bfloat16),
                                  Xsu.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32))
    got4b = np.asarray(ax2_i4_pallas(Xsp, W2[:ms]))
    log(f"ax2_i4 correctness: relerr="
        f"{np.max(np.abs(got4b - ref4b)) / np.max(np.abs(ref4b)):.2e}")
    del Xs, Xsn, Xsp, Xsu, ref, got, ref4, got4, ref4b, got4b

    # ---- int8 timings at full M ----
    Xq = gen_int8(kx, M, -127, 128)

    @jax.jit
    def atx_einsum(X, yv):
        return jnp.einsum("mn,n->m", X.astype(jnp.bfloat16),
                          yv.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def ax2_einsum(X, Wv):
        return jnp.einsum("mk,mn->nk", Wv.astype(jnp.bfloat16),
                          X.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    t = timeit(lambda: atx_einsum(Xq, y))
    log(f"atx einsum int8->bf16 M={M}: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")
    t = timeit(lambda: ax2_einsum(Xq, W2))
    log(f"ax_batch(K=2) einsum M={M}: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")
    for tm in (256, 512):
        t = timeit(lambda: atx_i8_vpu(Xq, y, tm))
        log(f"atx pallas int8 VPU TM={tm}: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")
    t = timeit(lambda: ax2_i8_pallas(Xq, W2))
    log(f"ax_batch(K=2) pallas int8 MXU: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    del Xq

    # ---- int4 timings at full M ----
    Xn = gen_int8(kx, M, 0, 16)
    Xp = pack_nibbles(Xn)
    del Xn
    GB4 = M * N2 / 1e9

    for tm in (256, 512):
        t = timeit(lambda: atx_i4_vpu(Xp, y, tm))
        log(f"atx pallas int4 VPU TM={tm}: {t*1e3:.2f} ms = {GB4/t:.0f} GB/s "
            f"packed ({GB/t:.0f} GB/s effective)")
    t = timeit(lambda: ax2_i4_pallas(Xp, W2))
    log(f"ax_batch(K=2) pallas int4 MXU: {t*1e3:.2f} ms = {GB4/t:.0f} GB/s "
        f"packed ({GB/t:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
