"""Communication-structure assertions for the sharded iteration.

The defining property of the reference's marker sharding (SURVEY §2.3) is
that EVERY cross-rank exchange is an Allreduce of an N-length vector or a
scalar — never anything proportional to M (src/data.cpp:367; the scalar
Allreduces in src/vamp.cpp).  These tests compile the sharded programs on
the virtual 8-device mesh and inspect the optimized HLO: all-reduces may
only carry O(N)-sized operands, and no M-length all-gather may appear
(which would mean a chip materializing other chips' marker shards).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampomi_tpu.ops.operator import ax, build_design
from vampomi_tpu.ops.spectral import build_spectral

N, MT = 96, 4000  # MT >> N so any M-sized collective is unambiguous


@pytest.fixture(scope="module")
def sharded_dm(mesh8):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(MT, N))
    return build_design(X, mesh=mesh8, compute_dtype=jnp.float64)


def collective_shapes(hlo_text: str):
    """[(op, element_count)] for every collective in optimized HLO —
    handles both single-shape (`= f64[96]{0} all-reduce(`) and tuple-shape
    (`= (f64[96,96]{1,0}, f64[]) all-reduce(`) result forms."""
    out = []
    ops = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all")
    for line in hlo_text.splitlines():
        for base in ops:
            # async lowering splits collectives into start/done pairs —
            # match the start form too so an async M-length gather can't
            # slip past the guard
            op = next(
                (f"{base}{s}" for s in ("", "-start") if f" {base}{s}(" in line),
                None,
            )
            if op is None:
                continue
            head = line.split(f" {op}(")[0]
            shapes = re.findall(r"\w+\[([\d,]*)\]", head)
            for dims_s in shapes:
                dims = [int(d) for d in dims_s.split(",") if d]
                out.append((op, int(np.prod(dims)) if dims else 1))
    return out


def test_ax_single_n_length_allreduce(sharded_dm):
    x = jnp.zeros(sharded_dm.m_pad)
    hlo = jax.jit(ax).lower(sharded_dm, x).compile().as_text()
    cols = collective_shapes(hlo)
    reduces = [c for c in cols if c[0] == "all-reduce"]
    assert reduces, "sharded ax must all-reduce its N-length partials"
    for op, count in cols:
        assert count <= 2 * N, (op, count)


def test_spectral_iteration_collectives_are_o_n(sharded_dm, mesh8):
    from vampomi_tpu.engine.linear import _iteration_phase_spectral
    from vampomi_tpu.ops.operator import atx
    from vampomi_tpu.prior.mixture import init_prior

    dm = sharded_dm
    fac = build_spectral(dm, block=512)
    prior = init_prior([0.9, 0.07, 0.03], [0.0, 1e-3, 1e-2], N)
    m_pad = dm.m_pad
    y = jnp.zeros(N)
    aty = jax.jit(atx)(dm, y)
    z = jnp.zeros(m_pad)

    fn = getattr(_iteration_phase_spectral, "__wrapped__", _iteration_phase_spectral)
    hlo = (
        jax.jit(fn)
        .lower(
            dm, fac, aty, y, z, jnp.asarray(1.0), prior, z,
            jnp.asarray(False), jnp.asarray(0.5), jnp.asarray(2.0), z,
        )
        .compile()
        .as_text()
    )
    cols = collective_shapes(hlo)
    assert cols, "expected collectives in the sharded program"
    # every collective is O(N): the (N, 2) multi-RHS all-reduce, N-length
    # vectors, or scalar reductions — NEVER an M-proportional exchange
    for op, count in cols:
        assert count <= 4 * N, f"{op} of {count} elements (M leak?)"


def test_eigen_iteration_collectives_are_o_n(mesh8):
    """The eigen phase with a column-SHARDED eigenbasis: GSPMD must lower
    U^T(Av) as a communication-free sharded contraction and U(d∘t) with an
    O(N) all-reduce — the distributed dense path of SCALING.md.  Any
    M-length or N²-length exchange fails."""
    from vampomi_tpu.engine.linear import _iteration_phase_eigen
    from vampomi_tpu.ops.eigen import build_eigen
    from vampomi_tpu.ops.operator import atx, build_design
    from vampomi_tpu.prior.mixture import init_prior

    n_div = 128  # divides the 8-device mesh -> U actually sharded
    rng = np.random.default_rng(1)
    X = rng.normal(size=(4000, n_div))
    dm = build_design(X, mesh=mesh8, compute_dtype=jnp.float64)
    ef, _ = build_eigen(build_spectral(dm, block=512), leaf=32)
    assert ef.U.sharding.spec[1] is not None  # sharded columns

    prior = init_prior([0.9, 0.07, 0.03], [0.0, 1e-3, 1e-2], n_div)
    m_pad = dm.m_pad
    y = jnp.zeros(n_div)
    aty = jax.jit(atx)(dm, y)
    z = jnp.zeros(m_pad)

    fn = getattr(_iteration_phase_eigen, "__wrapped__", _iteration_phase_eigen)
    hlo = (
        jax.jit(fn)
        .lower(
            dm, ef, aty, y, z, jnp.asarray(1.0), prior, z,
            jnp.asarray(False), jnp.asarray(0.5), jnp.asarray(2.0), z,
        )
        .compile()
        .as_text()
    )
    cols = collective_shapes(hlo)
    assert cols, "expected collectives in the sharded program"
    for op, count in cols:
        assert count <= 4 * n_div, f"{op} of {count} elements (M or N^2 leak?)"


def test_gram_pieces_psum_is_nxn(sharded_dm, mesh8):
    """The gram build's only collective is the psum of the (N, N) pieces
    (+ the N-length t and scalar s2) — lowered through the same shard_map
    construction ops/spectral.gram uses (gram itself dispatches its own jit,
    so the shard-mapped kernel is lowered here directly)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from vampomi_tpu.ops.spectral import _gram_pieces_local
    from vampomi_tpu.sharding import MARKER_AXIS

    dm = sharded_dm

    @functools.partial(
        jax.shard_map,
        mesh=mesh8,
        in_specs=(P(MARKER_AXIS, None), P(MARKER_AXIS), P(MARKER_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def pieces(Xl, msigl, mavel):
        G, t, s2 = _gram_pieces_local(Xl, msigl, mavel, dm.wd, 512)
        return (
            jax.lax.psum(G, MARKER_AXIS),
            jax.lax.psum(t, MARKER_AXIS),
            jax.lax.psum(s2, MARKER_AXIS),
        )

    hlo = jax.jit(pieces).lower(dm.X, dm.msig, dm.mave).compile().as_text()
    cols = collective_shapes(hlo)
    reduces = [c for c in cols if c[0] == "all-reduce"]
    assert reduces, "gram build must psum the N x N pieces"
    for op, count in cols:
        # the N^2 psum (+ the N-length t and scalar s2, possibly fused)
        assert count <= N * N + 2 * N + 8, (op, count)
