"""Speculative parallel AOT precompilation of the eigen-build kernel set.

The eigen build (ops/eigen.py) is ~2 s of MXU FLOPs behind, cold, ~20
minutes of REMOTE compiles on the axon relay platform: the host-driven
recursion touches ~40-90 distinct (kernel, shape) pairs and the relay
compiles each serially as the build first reaches it (round-3 review,
Weak #3).  Every kernel shape is quantized (ops/eigen.py `_quant`), so the
full shape lattice a build at (n, leaf, dtype) can touch is ENUMERABLE UP
FRONT — this module walks that lattice and AOT-compiles it
(`fn.lower(avals).compile()`) on a thread pool, concurrently with the
build itself:

  * AOT compiles go through the SAME persistent compilation cache
    (jax_compilation_cache_dir) and — because every eigen kernel takes
    strong-typed args (ops/eigen.py `_i32`, explicit-dtype scalars) —
    the SAME cache keys as the build's own jit calls, so a kernel the
    pool has finished is a ~0.1 s cache load when the build reaches it
    (measured; a cold compile is ~5-30 s);
  * `jax.jit(...).lower()` takes jax.ShapeDtypeStruct avals: no device
    buffers are allocated, so the pool adds zero HBM pressure next to
    the build's transients;
  * work is ordered by the build's own chronology (root shapes first,
    then descending block width), so the main thread mostly finds warm
    entries even while the tail of the lattice is still compiling;
  * compilation happens in the C++ PJRT client with the GIL released —
    worker threads overlap with each other (relay concurrency) and with
    the build's device waits / host leaf eighs either way.

The lattice is speculative: a build only touches the (r, kq) pairs its
dataset's spectrum produces, so some compiles are wasted — that is the
point (they run in parallel ahead of need).  The enumeration errs
inclusive; anything it misses simply compiles on demand exactly as
before.

Reference mapping: no counterpart — this is pure TPU-platform
engineering for the once-per-dataset diagonalization that replaces the
reference's per-iteration CG solves (src/vamp.cpp:494-529).
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import eigen as _eig


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def lattice_widths(n: int, leaf: int = 2048) -> list[int]:
    """Block widths a build at size n can touch: the root n plus every
    quantum multiple below it (children arrive padded to quantized widths,
    ops/eigen.py _orth_range).  Descending — the build splits the largest
    blocks first."""
    q = _eig._quant(n)
    widths = {n}
    # children can overhang the parent by one quantum when a split is
    # extremely lopsided (kq = ceil(need/q)*q with need up to k + 1416)
    w = ((n + q - 1) // q) * q
    while w >= max(q, 64):
        widths.add(w)
        w -= q
    return sorted(widths, reverse=True)


def eigen_compile_plan(n: int, wd=jnp.float32, leaf: int = 2048):
    """[(priority, label, thunk)] covering the build's kernel/shape
    lattice; lower priority = needed earlier.  Thunks are closures over
    `fn.lower(...).compile()` — safe to run on any thread."""
    kdt = jnp.uint32  # raw PRNGKey pair (jax.random.PRNGKey)
    i32 = _sds((), jnp.int32)
    plan = []

    def aot(pri, label, fn, *avals, **statics):
        plan.append((pri, label,
                     lambda: fn.lower(*avals, **statics).compile()))

    # ---- phase 0: fixed-shape root work (slq bounds, fingerprint) ----
    aot(0, "gauss_probes", _eig._gauss_jit, _sds((2,), kdt),
        shape=(n, 8), dtype=wd)
    aot(0, "slq_norm", _eig._slq_norm, _sds((n, 8), wd))
    aot(0, "zeros_probes", _eig._zeros_jit, shape=(n, 8), dtype=wd)
    aot(0, "zeros_beta", _eig._zeros_jit, shape=(8,), dtype=wd)
    aot(0, "lanczos", _eig._lanczos_step, _sds((n, n), wd), _sds((n, 8), wd),
        _sds((n, 8), wd), _sds((8,), wd))
    aot(1, "fingerprint", _eig._fingerprint_jit, _sds((n, n), wd))
    aot(1, "upad", _eig._zeros_jit, shape=(n, n + _eig.U_TAIL), dtype=wd)

    # ---- per block width r, in the order the build descends ----
    widths = lattice_widths(n, leaf)
    for wi, r in enumerate(widths):
        base = 2 + 10 * wi
        rr = _sds((r, r), wd)
        rv = _sds((r,), wd)
        sc = _sds((), wd)
        aot(base + 0, f"trace[{r}]", _eig._trace_jit, rr)
        aot(base + 0, f"sign_init[{r}]", _eig._sign_init, rr, rv, sc)
        aot(base + 0, f"ns_step[{r}]", _eig._ns_step, rr, sc, sc)
        aot(base + 1, f"sign_finish[{r}]", _eig._sign_finish, rr, rv)

        cw = min(2 * 512 - 56, r)
        aot(base + 2, f"gauss_slab[{r}]", _eig._gauss_jit, _sds((2,), kdt),
            shape=(r, cw), dtype=wd)
        aot(base + 2, f"gram[{r}]", _eig._gram_jit, _sds((r, cw), wd))
        aot(base + 2, f"mix[{r}]", _eig._mix_jit, _sds((r, cw), wd),
            _sds((cw, cw), wd))
        if r > 1024:
            # chunked slabs only run when a child rank exceeds the final
            # slab (k > 960) — impossible for smaller parents
            aot(base + 3, f"gauss_chunk[{r}]", _eig._gauss_jit,
                _sds((2,), kdt), shape=(r, _eig._CHUNK), dtype=wd)

        # basis buffers / compression over every quantized child width;
        # near-balanced splits (kq ~ r/2) first — the trace-mean split is
        # near-balanced for bulk spectra, outlier tails split lopsided
        q = _eig._quant(r)
        # kq >= cw always: _orth_range's need = max(k, cw), so no basis
        # buffer is ever narrower than the sample slab
        kqs = [kq for kq in range(q, ((r + q - 1) // q) * q + 1, q)
               if kq >= cw]
        kqs.sort(key=lambda kq: abs(kq - r // 2))
        for ki, kq in enumerate(kqs):
            pk = base + 4 + min(ki, 3)
            rk = _sds((r, kq), wd)
            aot(pk, f"zeros[{r},{kq}]", _eig._zeros_jit,
                shape=(r, kq), dtype=wd)
            aot(pk, f"project_slab[{r},{kq}]", _eig._project_slab, rr, rk,
                _sds((r, cw), wd))
            aot(pk, f"slab_write[{r},{kq}]", _eig._slab_write, rk,
                _sds((r, cw), wd), i32)
            if r > 1024 and kq > 960:
                aot(pk, f"subspace_chunk[{r},{kq}]", _eig._subspace_chunk,
                    rr, rk, _sds((r, _eig._CHUNK), wd), i32)
            if r == n:
                aot(pk, f"compress_root[{kq}]", _eig._compress_root,
                    _sds((n, n), wd), _sds((n, kq), wd))
            aot(pk + 1, f"compress[{r},{kq}]", _eig._compress, rr,
                _sds((n, r), wd), rk)

        # a leaf is any block whose REAL rank is <= leaf — its padded buffer
        # width can be any lattice value (a rank-k child rides a kq-wide
        # quantized buffer), so leaf mixing must cover every width
        pri_leaf = base + (2 if r <= leaf + _eig._quant(leaf) else 6)
        aot(pri_leaf, f"leaf_mix[{r}]", _eig._leaf_mix, _sds((n, r), wd), rr)
        aot(pri_leaf, f"leaf_write[{r}]", _eig._leaf_write,
            _sds((n, n + _eig.U_TAIL), wd), _sds((n, r), wd), i32, i32)

    # root can be eigh'd directly only when n <= leaf (not worth covering)
    # ---- final assembly ----
    aot(90, "reorder", _eig._reorder_jit, _sds((n, n + _eig.U_TAIL), wd),
        _sds((n,), jnp.int32))
    aot(90, "rayleigh", _eig._rayleigh_jit, _sds((n, n), wd), _sds((n, n), wd))

    plan.sort(key=lambda t: t[0])
    return plan


class PrecompileHandle:
    """Background precompile pool: cancel() drops everything not yet
    started (the build finished — the tail of the lattice is moot)."""

    def __init__(self, pool, futures, t0):
        self._pool = pool
        self._futures = futures
        self._t0 = t0
        self.compiled = 0
        self.failed = 0

    def cancel(self):
        for f in self._futures:
            f.cancel()
        self._pool.shutdown(wait=False, cancel_futures=True)

    def wait(self, timeout=None):
        done, _ = _fut.wait(self._futures, timeout=timeout)
        return len(done)


def start_background_precompile(
    n: int,
    wd=jnp.float32,
    leaf: int = 2048,
    workers: int | None = None,
    deadline: float | None = None,
    verbose: bool = False,
) -> PrecompileHandle:
    """Launch the lattice compile pool and return immediately."""
    if workers is None:
        workers = int(os.environ.get("VAMPOMI_EIGEN_PRECOMPILE_WORKERS", "8"))
    plan = eigen_compile_plan(n, wd=wd, leaf=leaf)
    t0 = time.time()
    pool = _fut.ThreadPoolExecutor(
        max_workers=workers, thread_name_prefix="eigen-precompile")
    handle = PrecompileHandle(pool, [], t0)
    lock = threading.Lock()

    def run(label, thunk):
        if deadline is not None and time.time() > deadline:
            return
        t = time.time()
        try:
            thunk()
            with lock:
                handle.compiled += 1
            if verbose:
                print(f"eigen-precompile[{time.time() - t0:6.1f}s] {label} "
                      f"({time.time() - t:.1f}s)", file=sys.stderr, flush=True)
        except Exception as e:  # speculative — never take the build down
            with lock:
                handle.failed += 1
            if verbose:
                print(f"eigen-precompile: {label} failed "
                      f"({type(e).__name__}: {e})", file=sys.stderr,
                      flush=True)

    handle._futures = [pool.submit(run, label, thunk)
                       for _, label, thunk in plan]
    return handle


def precompile_wanted(n: int) -> bool:
    """Default gate: the pool only pays off where compiles are remote and
    expensive (the axon relay) and the lattice is nontrivial.  CPU test
    builds compile locally in milliseconds — the pool would only add
    thread noise.  VAMPOMI_EIGEN_PRECOMPILE=1/0 forces either way."""
    env = os.environ.get("VAMPOMI_EIGEN_PRECOMPILE", "")
    if env in ("0", "1"):
        return env == "1"
    return n >= 2048 and jax.default_backend() in ("axon", "tpu")
