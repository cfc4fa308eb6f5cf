"""Measure the packed-int4 Pallas atx_batch kernel against the
unpack-einsum fallback (round-3 review ask #8): wall time per call and the
HBM high-water mark, at a capacity-mode shape.

The fallback materializes BOTH bf16 code halves at full M — 4x the packed
byte footprint — which is exactly what the kernel exists to avoid; the
probe runs kernel-first (lower peak), then the fallback, and reports the
peak-bytes jump attributable to the unpack transient.

Usage: python tools/int4_kernel_probe.py [--small]
Writes INT4_KERNEL.json at the repo root (skipped with --small).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import bench  # noqa: E402

bench._child_imports()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vampomi_tpu.ops import pallas_matvec  # noqa: E402
from vampomi_tpu.ops.operator import atx_batch, unpack_nibbles  # noqa: E402


def peak_gb():
    try:
        st = jax.devices()[0].memory_stats() or {}
        return st.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return 0.0


def main():
    small = "--small" in sys.argv
    if small:
        jax.config.update("jax_platforms", "cpu")
        m, n, k = 16384, 512, 2
    else:
        # capacity-mode shape: 2^21 markers x N=10240 packed int4 = 10 GiB
        # (the M ~ 2e6/chip configuration DESIGN.md advertises)
        m, n, k = 2_097_152, 10240, 2

    dm, _y, _r1, _prior = bench.make_problem(m, n, jnp.uint8)
    bench.sync(dm.X)
    rng = np.random.default_rng(1)
    ys = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))

    out = {"shape": dict(M=m, N=n, K=k, packed_gib=round(m * n / 2 / 2**30, 2))}

    # ---- kernel path (the production gate) ----
    tmk = pallas_matvec.atx_batch_packed4_applicable(dm, k)
    out["kernel_applicable"] = tmk is not None
    if tmk is not None:
        f = jax.jit(lambda d, y: atx_batch(d, y))
        t = bench.time_calls(lambda: f(dm, ys), k=5)
        out["kernel"] = dict(
            ms_per_call=round(t * 1e3, 2),
            gbps=round(m * n * 0.5 / t / 1e9, 1),
            peak_gib_after=round(peak_gb(), 2),
        )
        print(f"kernel: {t*1e3:.1f} ms = "
              f"{out['kernel']['gbps']} GB/s over packed bytes, "
              f"peak {out['kernel']['peak_gib_after']} GiB", flush=True)

    # ---- fallback path (unpack-einsum; the multi-device route) ----
    def fallback(d, y):
        n2 = d.X.shape[1]
        lo, hi = unpack_nibbles(d.X)
        yb = y.astype(jnp.bfloat16)
        xy = (jnp.einsum("mn,nk->mk", lo, yb[:n2],
                         preferred_element_type=jnp.float32)
              + jnp.einsum("mn,nk->mk", hi, yb[n2:],
                           preferred_element_type=jnp.float32))
        return xy

    try:
        g = jax.jit(fallback)
        t = bench.time_calls(lambda: g(dm, ys), k=3)
        out["fallback"] = dict(
            ms_per_call=round(t * 1e3, 2),
            gbps_packed_equiv=round(m * n * 0.5 / t / 1e9, 1),
            peak_gib_after=round(peak_gb(), 2),
        )
        print(f"fallback: {t*1e3:.1f} ms (packed-equivalent "
              f"{out['fallback']['gbps_packed_equiv']} GB/s), peak "
              f"{out['fallback']['peak_gib_after']} GiB", flush=True)
    except Exception as e:
        # at the capacity shape the 4x bf16 transient may simply not fit —
        # which IS the finding
        out["fallback"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"fallback failed (expected at capacity shape): "
              f"{type(e).__name__}", flush=True)

    out["note"] = (
        "atx_batch on packed int4: the Pallas kernel streams X tile-by-tile "
        "(no full-M unpack transient); the einsum fallback materializes both "
        "bf16 halves = 4x the packed bytes.  Kernel measured FIRST so the "
        "fallback's peak delta is the transient's size."
    )
    print(json.dumps(out, indent=1))
    if not small:
        with open(os.path.join(_ROOT, "INT4_KERNEL.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
