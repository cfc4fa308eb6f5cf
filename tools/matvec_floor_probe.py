"""HBM floor analysis for the north-star LMMSE matvec (VERDICT r4 ask #7).

The headline `normal_eq_mult` (A^T A v, ops/operator.py:345) is two HBM
passes over the int8 X: a broadcast pass (ax: "mk,mn->nk" einsum) and a
reduce pass (atx: Pallas VPU kernel, ops/pallas_matvec.py).  BENCH_r04
measured the fusion at 643 GB/s vs v5e's 819 GB/s paper peak.  This probe
answers "what is actually attainable" by measuring, at the bench shape
(M=2^20, N=10240, int8):

  1. the PURE READ floor — Pallas kernels that stream every X tile
     through VMEM and do the least compute that cannot be elided
     (whole-tile int32 sum; plus an axis-1 variant writing (TM,1)) —
     the measured ceiling no matvec can exceed;
  2. the reduce direction: the shipped VPU kernel over a tile sweep,
     an MXU-contraction variant (cast tile to bf16, (TM,N)x(N,1) on the
     MXU — trades exactness-irrelevant FLOPs for VPU pressure), and the
     einsum fallback;
  3. the broadcast direction: the shipped einsum and a Pallas MXU
     accumulator variant ((1,TM)x(TM,N) per tile);
  4. the fused headline exactly as bench.py times it, plus the implied
     two-pass ceiling  2 / (1/best_ax + 1/best_atx)  from the best
     single-pass numbers.

Writes MATVEC_FLOOR.json at the repo root; DESIGN.md §3 cites it.  The
`--small` mode runs every kernel in the Pallas interpreter at toy shapes
(correctness + plumbing only, no timing claims) so the tool is
CPU-smoke-testable during a relay outage.

Reference mapping: this is the cost model of the reference's hot loop —
2 passes over the M x N matrix per CG step (src/data.cpp:315-373,
src/vamp.cpp:645-662); BASELINE.md's "LMMSE matvec GB/s/chip at HBM
speed-of-light" north star.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SMALL = "--small" in sys.argv
if SMALL:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

if SMALL:
    jax.config.update("jax_platforms", "cpu")

M = 4096 if SMALL else 1 << 20
N = 512 if SMALL else 10240
GB = M * N / 1e9


def log(m):
    print(f"[floor] {m}", flush=True)


def sync(x):
    jax.block_until_ready(x)
    return x


def timeit(fn, k=20):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(k):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / k


# ---------------------------------------------------------------- kernels
def _stream_sum_kernel(x_ref, o_ref):
    # minimal un-elidable compute: every byte participates in an i32 sum
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # dtype pinned: under the package's global x64, jnp.sum(int32) promotes
    # its accumulator to int64 and Mosaic refuses the kernel on the chip
    # (same footgun as ops/pallas_matvec.py's enable_x64(False) wrapper —
    # the kernel jaxpr is lowered outside that context)
    o_ref[0, 0] += jnp.sum(x_ref[:].astype(jnp.int32), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def stream_sum(Xq, tm, interpret=False):
    m, n = Xq.shape
    with jax.enable_x64(False):
        return pl.pallas_call(
            _stream_sum_kernel,
            grid=(m // tm,),
            in_specs=[pl.BlockSpec((tm, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=interpret,
        )(Xq)


def _stream_rowsum_kernel(x_ref, o_ref):
    # same bytes, but the output is (TM, 1) like the reduce matvec's —
    # isolates whether the atx kernel's cost is the write pattern
    o_ref[:] = jnp.sum(x_ref[:].astype(jnp.int32), axis=1, keepdims=True,
                       dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def stream_rowsum(Xq, tm, interpret=False):
    m, n = Xq.shape
    with jax.enable_x64(False):
        return pl.pallas_call(
            _stream_rowsum_kernel,
            grid=(m // tm,),
            in_specs=[pl.BlockSpec((tm, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 1), jnp.int32),
            interpret=interpret,
        )(Xq)


def _atx_mxu_kernel(y_ref, x_ref, o_ref):
    # reduce direction on the MXU as a standard (TM, N) @ (N, 1)
    # contraction — Mosaic rejects the (TM, N) x (1, N) same-dim form
    # ('vector.broadcast' element-type verification), so the y block is
    # laid out (N, 1) like the shipped atx_batch kernels
    xb = x_ref[:].astype(jnp.bfloat16)
    yb = y_ref[:].astype(jnp.bfloat16)  # (N, 1)
    o_ref[:] = jax.lax.dot_general(
        xb, yb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def atx_mxu(Xq, y, tm, interpret=False):
    m, n = Xq.shape
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _atx_mxu_kernel,
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
            interpret=interpret,
        )(y.astype(jnp.float32).reshape(n, 1), Xq)
    return out[:, 0]


def _ax_mxu_kernel(w_ref, x_ref, o_ref):
    # broadcast direction: (1, TM) x (TM, N) on the MXU, accumulated in
    # the f32 output block across grid steps
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    wb = w_ref[:].astype(jnp.bfloat16)  # (1, TM)
    xb = x_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jax.lax.dot_general(
        wb, xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def ax_mxu(Xq, w, tm, interpret=False):
    m, n = Xq.shape
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _ax_mxu_kernel,
            grid=(m // tm,),
            in_specs=[
                pl.BlockSpec((1, tm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            interpret=interpret,
        )(w.astype(jnp.float32).reshape(1, m), Xq)
    return out[0]


# ------------------------------------------------------------ generation
def gen_int8(key, m, n):
    chunk = min(m, 16384)

    @jax.jit
    def gen(kk):
        ks = jax.random.split(kk, m // chunk)
        _, out = jax.lax.scan(
            lambda c, k2: (c, jax.random.randint(
                k2, (chunk, n), -127, 128, dtype=jnp.int8)),
            0, ks)
        return out.reshape(m, n)

    return gen(key)


def main():
    from vampomi_tpu.ops import pallas_matvec
    from vampomi_tpu.ops.operator import DesignMatrix, normal_eq_mult

    interp = SMALL
    key = jax.random.PRNGKey(7)
    kx, kw, ky = jax.random.split(key, 3)
    Xq = sync(gen_int8(kx, M, N))
    w = jax.random.normal(kw, (M,), dtype=jnp.float32)
    y = jax.random.normal(ky, (N,), dtype=jnp.float32)

    # correctness of the probe kernels against f32 einsums (always run;
    # in --small this is the whole point)
    Xf = Xq[:4096].astype(jnp.float32) if not SMALL else Xq.astype(jnp.float32)
    ms = Xf.shape[0]
    ref_atx = np.asarray(Xf @ y)
    got_atx = np.asarray(atx_mxu(Xq[:ms], y, 512 if not SMALL else 256,
                                 interpret=interp))
    rel = np.max(np.abs(got_atx - ref_atx)) / np.max(np.abs(ref_atx))
    log(f"atx_mxu relerr {rel:.2e}")
    assert rel < 5e-2, "atx_mxu bf16 contraction off"  # bf16 y rounding
    ref_ax = np.asarray(w[:ms] @ Xf)
    got_ax = np.asarray(ax_mxu(Xq[:ms], w[:ms], 512 if not SMALL else 256,
                               interpret=interp))
    rel = np.max(np.abs(got_ax - ref_ax)) / np.max(np.abs(ref_ax))
    log(f"ax_mxu relerr {rel:.2e}")
    assert rel < 5e-2
    # references accumulate in int32 to match the kernels' pinned dtype
    # (identical wraparound semantics; the expected |sum| at these shapes
    # is ~1e6, nowhere near 2^31)
    ssum = int(np.asarray(stream_sum(Xq[:ms], 256, interpret=interp))[0, 0])
    assert ssum == int(np.sum(np.asarray(Xq[:ms], np.int32), dtype=np.int32))
    rsum = np.asarray(stream_rowsum(Xq[:ms], 256, interpret=interp))[:, 0]
    assert (rsum == np.sum(np.asarray(Xq[:ms], np.int32), axis=1,
                           dtype=np.int32)).all()
    log("probe kernels correct")

    if SMALL:
        log("--small: interpreter correctness only, no timings")
        return

    results = {}

    def rec(name, t):
        results[name] = {"ms": round(t * 1e3, 3), "gbps": round(GB / t, 1)}
        log(f"{name}: {t*1e3:.2f} ms = {GB/t:.0f} GB/s")

    # 1. pure read floor
    for tm in (256, 512):
        rec(f"stream_sum_tm{tm}", timeit(lambda: stream_sum(Xq, tm)))
        rec(f"stream_rowsum_tm{tm}", timeit(lambda: stream_rowsum(Xq, tm)))

    # 2. reduce direction
    for tm in (128, 256, 512):
        rec(f"atx_vpu_tm{tm}",
            timeit(lambda: pallas_matvec.atx_int8_raw(Xq, y, tm)))
        rec(f"atx_mxu_tm{tm}", timeit(lambda: atx_mxu(Xq, y, tm)))

    @jax.jit
    def atx_einsum(X, yv):
        return jnp.einsum("mn,n->m", X.astype(jnp.bfloat16),
                          yv.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    rec("atx_einsum_bf16", timeit(lambda: atx_einsum(Xq, y)))

    # 3. broadcast direction
    @jax.jit
    def ax_einsum(X, wv):
        return jnp.einsum("m,mn->n", wv.astype(jnp.bfloat16),
                          X.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    rec("ax_einsum_bf16", timeit(lambda: ax_einsum(Xq, w)))
    for tm in (256, 512):
        rec(f"ax_mxu_tm{tm}", timeit(lambda: ax_mxu(Xq, w, tm)))

    # 4. the fused headline, exactly as bench.py measures it
    wd = jnp.float32
    dm = DesignMatrix(
        X=Xq,
        mave=jnp.zeros(M, wd), msig=jnp.ones(M, wd), mmask=jnp.ones(M, wd),
        inv_sqrt_n=jnp.asarray(1.0 / np.sqrt(N), wd),
        n=jnp.asarray(float(N), jnp.float64),
        mt=jnp.asarray(float(M), jnp.float64),
    )
    nev = jax.jit(lambda d, v: normal_eq_mult(d, v, jnp.asarray(1.0),
                                              jnp.asarray(1.0)))
    t_fused = timeit(lambda: nev(dm, w), k=10)
    results["fused_normal_eq"] = {"ms": round(t_fused * 1e3, 3),
                                  "gbps": round(2 * GB / t_fused, 1)}
    log(f"fused A^T A v: {t_fused*1e3:.2f} ms = {2*GB/t_fused:.0f} GB/s "
        "(2 passes)")

    floor = max(v["gbps"] for k, v in results.items()
                if k.startswith("stream"))
    best_atx = max(v["gbps"] for k, v in results.items()
                   if k.startswith("atx"))
    best_ax = max(v["gbps"] for k, v in results.items()
                  if k.startswith("ax"))
    implied = 2.0 / (1.0 / best_ax + 1.0 / best_atx)
    summary = {
        "shape": {"M": M, "N": N, "dtype": "int8", "x_bytes_gb": GB},
        "paper_peak_gbps": 819.0,
        "read_floor_gbps": floor,
        "best_atx_gbps": best_atx,
        "best_ax_gbps": best_ax,
        "implied_two_pass_gbps": round(implied, 1),
        "fused_measured_gbps": results["fused_normal_eq"]["gbps"],
        "results": results,
        "device": str(jax.devices()[0]),
        "ts": time.time(),
    }
    out = os.path.join(_ROOT, "MATVEC_FLOOR.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    log(f"wrote {out}: floor {floor:.0f}, implied 2-pass {implied:.0f}, "
        f"fused {summary['fused_measured_gbps']:.0f} GB/s")


if __name__ == "__main__":
    main()
