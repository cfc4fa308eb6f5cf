"""Round-3 architecture probes on the real TPU.

Measures (1) int8 design-matrix matvec routes (the north-star M>=1e6 shape
needs a 1-byte X), (2) the N^2 matvec and N^3 matmul costs that set the
eigen-LMMSE design's per-iteration and once-per-dataset budgets.

Run: python tools/r3_probe.py  (on the axon TPU)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    return float(jax.device_get(x.ravel()[0] if x.ndim else x))


def timeit(fn, k=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / k


def main():
    M, N = 524288, 8192
    key = jax.random.PRNGKey(0)
    kx, kw, kv = jax.random.split(key, 3)

    # int8 X, f32 weight vector.  Chunked generation: a single randint at
    # (M, N) materializes full-width random bits (4 bytes/elem) and OOMs.
    chunk = 16384

    @jax.jit
    def gen(k):
        ks = jax.random.split(k, M // chunk)
        _, out = jax.lax.scan(
            lambda c, kk: (c, jax.random.randint(
                kk, (chunk, N), -127, 128, dtype=jnp.int8)),
            0, ks)
        return out.reshape(M, N)

    Xq = gen(kx)
    w = jax.random.normal(kw, (M,), dtype=jnp.float32)
    y = jax.random.normal(kv, (N,), dtype=jnp.float32)

    GB = M * N / 1e9  # one pass over X in GB (1 byte/elem)

    # --- route A: upcast X to bf16 inside the einsum (fused?) ---
    @jax.jit
    def ax_bf16(X, wv):
        return jnp.einsum("m,mn->n", wv.astype(jnp.bfloat16),
                          X.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    t = timeit(lambda: ax_bf16(Xq, w))
    log(f"ax int8->bf16 einsum: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    @jax.jit
    def atx_bf16(X, yv):
        return jnp.einsum("mn,n->m", X.astype(jnp.bfloat16),
                          yv.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    t = timeit(lambda: atx_bf16(Xq, y))
    log(f"atx int8->bf16 einsum: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    # --- route B: int8 x int8 -> int32 MXU (dynamic-quantized vector) ---
    @jax.jit
    def ax_int8(X, wv):
        s = jnp.max(jnp.abs(wv)) / 127.0
        wq = jnp.clip(jnp.round(wv / s), -127, 127).astype(jnp.int8)
        z = jax.lax.dot_general(wq, X, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return z.astype(jnp.float32) * s

    t = timeit(lambda: ax_int8(Xq, w))
    log(f"ax int8xint8->int32: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    @jax.jit
    def atx_int8(X, yv):
        s = jnp.max(jnp.abs(yv)) / 127.0
        yq = jnp.clip(jnp.round(yv / s), -127, 127).astype(jnp.int8)
        v = jax.lax.dot_general(X, yq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return v.astype(jnp.float32) * s

    t = timeit(lambda: atx_int8(Xq, y))
    log(f"atx int8xint8->int32: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    # --- route C: upcast to f32 ---
    @jax.jit
    def ax_f32(X, wv):
        return jnp.einsum("m,mn->n", wv, X.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)

    t = timeit(lambda: ax_f32(Xq, w))
    log(f"ax int8->f32 einsum: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    # --- batched (K=2) bf16 route, the engine's actual shape ---
    W2 = jax.random.normal(kw, (M, 2), dtype=jnp.float32)

    @jax.jit
    def axb(X, Wv):
        return jnp.einsum("mk,mn->nk", Wv.astype(jnp.bfloat16),
                          X.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    t = timeit(lambda: axb(Xq, W2))
    log(f"ax_batch(K=2) int8->bf16: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    # --- dense building blocks for the eigen design ---
    for n in (8192, 10240):
        A = jax.random.normal(kx, (n, n), dtype=jnp.float32)
        v = jax.random.normal(kv, (n,), dtype=jnp.float32)

        @jax.jit
        def mv(Aa, vv):
            with jax.default_matmul_precision("highest"):
                return Aa @ vv

        t = timeit(lambda: mv(A, v), k=20)
        log(f"N^2 matvec f32 HIGHEST n={n}: {t*1e3:.2f} ms = {n*n*4/t/1e9:.0f} GB/s")

        @jax.jit
        def mv2(Aa, vv):
            with jax.default_matmul_precision("highest"):
                return Aa.T @ (Aa @ vv)

        t = timeit(lambda: mv2(A, v), k=20)
        log(f"UT(Uv) f32 HIGHEST n={n}: {t*1e3:.2f} ms")

        @jax.jit
        def ns_step(Xa):
            with jax.default_matmul_precision("highest"):
                X2 = Xa @ Xa
                return 1.5 * Xa - 0.5 * (Xa @ X2)

        t = timeit(lambda: ns_step(A), k=3)
        log(f"NS sign step (2 matmuls) f32 HIGHEST n={n}: {t*1e3:.1f} ms")

        # block-Lanczos step pieces: K @ Qb and full reorth QT (N x b)
        b = 64
        Qb = jax.random.normal(kv, (n, b), dtype=jnp.float32)
        Qall = jax.random.normal(kx, (n, n), dtype=jnp.float32)

        @jax.jit
        def lstep(K, Qa, qb):
            with jax.default_matmul_precision("highest"):
                Wv = K @ qb
                C = Qa.T @ Wv
                return Wv - Qa @ C

        t = timeit(lambda: lstep(A, Qall, Qb), k=5)
        log(f"lanczos step (KQb + reorth) n={n} b={b}: {t*1e3:.2f} ms "
            f"-> full build ~{t*n/b:.1f} s")


if __name__ == "__main__":
    main()
