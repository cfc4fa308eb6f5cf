"""Measure the eigen build's COLD wall time (fresh compilation cache) at a
given N, with and without the parallel AOT precompiler — the round-3
review's ask #2 asks for the measured number in SCALING.md's
once-per-dataset table.

Each measurement runs in a SUBPROCESS against its own empty
jax_compilation_cache_dir (the cache key hashes the configured directory,
so a fresh dir == a fully cold machine), building a synthetic
Marchenko-Pastur Gram on the device and timing build_eigen end to end.

Usage: python tools/eigen_cold_probe.py [N] [--cpu] [--warm-too]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROG = """
import json, os, sys, time
import jax
if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from vampomi_tpu.ops.eigen import build_eigen
from vampomi_tpu.ops.spectral import GramFactor

n = int(os.environ["PROBE_N"])
t0 = time.time()
# synthetic MP-bulk Gram from device-side randoms (m = 4n samples-worth):
# K = B B^T / m with B (n, m) standard normal — no host O(n*m) transfer
key = jax.random.PRNGKey(0)
with jax.default_matmul_precision("highest"):
    B = jax.random.normal(key, (n, 4 * n), dtype=jnp.float32)
    K = (B @ B.T) / float(4 * n)
    K = 0.5 * (K + K.T)
K.block_until_ready() if os.environ.get("PROBE_CPU") == "1" else float(K[0, 0])
t_gram = time.time() - t0

t0 = time.time()
ef, diag = build_eigen(GramFactor(K=K), verbose=True)
_ = float(ef.U[0, 0])
t_build = time.time() - t0
print(json.dumps({
    "n": n, "gram_seconds": round(t_gram, 1),
    "build_seconds": round(t_build, 1),
    "resid": diag["resid"], "splits": diag["splits"],
    "precompile": os.environ.get("VAMPOMI_EIGEN_PRECOMPILE", "auto"),
}))
"""


def run_once(n: int, cpu: bool, precompile: str, cache_dir: str) -> dict:
    env = dict(
        os.environ,
        PROBE_N=str(n),
        PROBE_CPU="1" if cpu else "0",
        VAMPOMI_COMPILE_CACHE=cache_dir,
        VAMPOMI_EIGEN_PRECOMPILE=precompile,
    )
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", _PROG], env=env, cwd=_ROOT,
                       capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        return {"error": r.stderr[-1500:]}
    out = json.loads(r.stdout.strip().splitlines()[-1])
    out["cold"] = True
    return out


def main():
    args = [a for a in sys.argv[1:]]
    cpu = "--cpu" in args
    warm_too = "--warm-too" in args
    pos = [a for a in args if not a.startswith("--")]
    n = int(pos[0]) if pos else 10240

    for pre in ("1", "0"):
        cache = tempfile.mkdtemp(prefix=f"eigen_cold_{pre}_")
        label = "precompile-on" if pre == "1" else "precompile-off"
        res = run_once(n, cpu, pre, cache)
        print(f"{label}: {json.dumps(res)}", flush=True)
        if warm_too and "error" not in res:
            res_w = run_once(n, cpu, pre, cache)  # same dir -> warm cache
            res_w["cold"] = False
            print(f"{label} (warm rerun): {json.dumps(res_w)}", flush=True)


if __name__ == "__main__":
    main()
