"""Pallas int8 A^T y kernel: interpret-mode numerics, tile selection, and
the operator wiring (ops/pallas_matvec.py; reference hot loop
src/data.cpp:315-333).

The kernel itself only runs natively on TPU; here the Pallas interpreter
locks its numerics on the CPU suite, and a monkeypatched gate drives the
full `atx` path through the kernel to prove the wiring is equivalent to
the einsum fallback.
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from vampomi_tpu.ops import pallas_matvec
from vampomi_tpu.ops.operator import atx, build_design


def test_kernel_matches_exact_int8_matvec():
    rng = np.random.default_rng(0)
    m, n = 96, 256
    Xq = rng.integers(-127, 128, size=(m, n), dtype=np.int8)
    y = rng.normal(size=n).astype(np.float32)
    tm = pallas_matvec.pick_tile(m, n)
    assert tm is not None and m % tm == 0
    got = np.asarray(
        pallas_matvec.atx_int8_raw(jnp.asarray(Xq), jnp.asarray(y), tm, interpret=True)
    )
    want = Xq.astype(np.float64) @ y.astype(np.float64)
    # int8 -> f32 upcast is exact; only the f32 accumulation rounds
    # (worst observed relerr ~5e-5 under cancellation at n=256)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_pick_tile():
    # north-star shape: TM=512 rows x 10240 bytes = 5.2 MB <= the VMEM cap
    assert pallas_matvec.pick_tile(1048576, 10240) == 512
    # m not divisible by any tile >= 8 -> fall back to the einsum
    assert pallas_matvec.pick_tile(100, 128) is None
    # tile shrinks to divide m
    assert pallas_matvec.pick_tile(64, 128) == 64
    # a tile row over the VMEM byte cap shrinks the tile
    tm = pallas_matvec.pick_tile(1 << 20, 32768)
    assert tm is not None and tm * 32768 <= pallas_matvec._MAX_TILE_BYTES


def test_atx_applicable_gates(small_fixture):
    # CPU backend (the test suite) must never take the Pallas path
    dm = build_design(small_fixture.X.T, mesh=None, compute_dtype=jnp.int8)
    assert pallas_matvec.atx_applicable(dm) is None
    # non-int8 dtypes are excluded regardless of backend
    dm32 = build_design(small_fixture.X.T, mesh=None, compute_dtype=jnp.float32)
    assert pallas_matvec.atx_applicable(dm32) is None


def test_atx_applicable_accepts_axon_backend(monkeypatch):
    """The relay-attached TPU registers its platform as "axon" (Pallas
    lowering is aliased to the "tpu" rules — axon/register/pjrt.py); the
    gate must treat it as a TPU.  Matching only "tpu" silently ran the
    479 GB/s einsum fallback on the production chip instead of the
    625 GB/s kernel."""
    import jax as _jax

    from vampomi_tpu.sim.data_sim import simulate_iid

    fx = simulate_iid(n=64, m=512, lam=0.1, h2=0.8, seed=1)  # tileable M
    dm = build_design(fx.X.T, mesh=None, compute_dtype=jnp.int8)
    monkeypatch.setattr(_jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(_jax, "device_count", lambda: 1)
    tm = pallas_matvec.atx_applicable(dm)
    assert tm is not None and dm.X.shape[0] % tm == 0
    # an unknown backend stays excluded
    monkeypatch.setattr(_jax, "default_backend", lambda: "gpu")
    assert pallas_matvec.atx_applicable(dm) is None


def test_atx_wiring_through_kernel(small_fixture, monkeypatch):
    """Force the gate open (interpret mode) and check the full `atx` —
    standardization corrections included — against the einsum fallback."""
    X = small_fixture.X[:, :448]  # M=448 = 64*7 tiles; the full 500 would not
    dm = build_design(X.T, mesh=None, compute_dtype=jnp.int8)
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=X.shape[0]).astype(np.float32))

    v_einsum = np.asarray(atx(dm, y))

    tm = pallas_matvec.pick_tile(*dm.X.shape)
    assert tm is not None, "fixture shape must tile for this test"
    monkeypatch.setattr(pallas_matvec, "atx_applicable", lambda _dm: tm)
    monkeypatch.setattr(
        pallas_matvec,
        "atx_int8_raw",
        functools.partial(pallas_matvec.atx_int8_raw.__wrapped__, interpret=True),
    )
    v_kernel = np.asarray(atx(dm, y))

    # einsum rounds y to bf16 before the contraction; the kernel keeps f32.
    # Both standardize identically, so they agree to bf16 tolerance.
    np.testing.assert_allclose(v_kernel, v_einsum, rtol=2e-2, atol=2e-2)

    # and the kernel route is the MORE accurate one vs the exact f64 product
    Xq = np.asarray(dm.X, dtype=np.float64)
    exact = np.asarray(dm.msig, dtype=np.float64) * (
        Xq @ np.asarray(y, dtype=np.float64)
        - np.asarray(dm.mave, dtype=np.float64) * float(jnp.sum(y))
    ) * float(dm.inv_sqrt_n)
    err_kernel = np.abs(v_kernel - exact).max()
    err_einsum = np.abs(v_einsum - exact).max()
    assert err_kernel <= err_einsum + 1e-12
