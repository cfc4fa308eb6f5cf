"""TPU timing probe for the eigen-LMMSE build at production N.

Builds a realistic MP-bulk Gram (from a synthetic bf16 design at modest M),
times build_eigen, validates residuals, and compares the per-iteration
dense cost (eigen solve+traces) against the fused factor pass.

Run: python tools/eigen_probe.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    return float(jax.device_get(x.ravel()[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    m = 262144
    from vampomi_tpu.ops.operator import DesignMatrix
    from vampomi_tpu.ops.spectral import (
        build_spectral, default_nb, shift_inverse, spectral_traces,
    )
    from vampomi_tpu.ops.eigen import build_eigen, eigen_solve, eigen_traces

    key = jax.random.PRNGKey(0)
    chunk = 16384

    @jax.jit
    def gen(k):
        ks = jax.random.split(k, m // chunk)
        _, out = jax.lax.scan(
            lambda c, kk: (c, jax.random.normal(kk, (chunk, n), dtype=jnp.bfloat16)),
            0, ks)
        return out.reshape(m, n)

    X = gen(key)
    dm = DesignMatrix(
        X=X, mave=jnp.zeros(m, jnp.float32), msig=jnp.ones(m, jnp.float32),
        mmask=jnp.ones(m, jnp.float32),
        inv_sqrt_n=jnp.asarray(1.0 / np.sqrt(n), jnp.float32),
        n=jnp.asarray(float(n), jnp.float64), mt=jnp.asarray(float(m), jnp.float64),
    )
    t0 = time.time()
    fac = build_spectral(dm)
    jax.block_until_ready(fac.K)
    log(f"gram build: {time.time()-t0:.1f}s")

    t0 = time.time()
    ef, diag = build_eigen(fac, verbose=True)
    sync(ef.U)
    t_build = time.time() - t0
    log(f"eigen build: {t_build:.1f}s  diag={diag}")

    # per-iteration dense comparison
    v = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype=jnp.float32)
    tau = jnp.asarray(10.0)
    gam2 = jnp.asarray(1.0)

    @jax.jit
    def eig_iter(efv, vv, t, g):
        from vampomi_tpu.ops.eigen import eigen_weights
        d, T = eigen_weights(efv, t, g)
        with jax.default_matmul_precision("highest"):
            q = efv.U @ (d.astype(jnp.float32) * (efv.U.T @ vv))
        return q, T

    @jax.jit
    def fac_iter(fv, t, g):
        winv = shift_inverse(fv, t, g, nb=default_nb(n))
        return winv.W, winv.T

    def timeit(fn, k=5):
        sync(fn()[0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        sync(out[0])
        return (time.perf_counter() - t0) / k

    t_eig = timeit(lambda: eig_iter(ef, v, tau, gam2))
    log(f"eigen per-iteration dense (2 matvecs + trace): {t_eig*1e3:.2f} ms")
    t_fac = timeit(lambda: fac_iter(fac, tau, gam2), k=3)
    log(f"factor per-iteration dense (shift_inverse): {t_fac*1e3:.1f} ms")

    # accuracy of the shifted solve vs the factor path
    winv = shift_inverse(fac, tau, gam2, nb=default_nb(n))
    q_fac = winv.solve(v)
    q_eig, _ = eig_iter(ef, v, tau, gam2)
    rel = float(jnp.linalg.norm(q_eig - q_fac) / jnp.linalg.norm(q_fac))
    t_f = spectral_traces(fac, float(m), tau, gam2, winv=winv)
    t_e = eigen_traces(ef, float(m), tau, gam2)
    log(f"solve rel-diff eigen vs factor: {rel:.2e}")
    log(f"tr_qinv rel-diff: {abs(float(t_f[0])-float(t_e[0]))/abs(float(t_f[0])):.2e}  "
        f"tr_ata rel-diff: {abs(float(t_f[1])-float(t_e[1]))/abs(float(t_f[1])):.2e}")


if __name__ == "__main__":
    main()
