"""Pallas fused standardize-matvec kernels vs the XLA einsum operator
(interpret mode on the CPU test platform)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vampomi_tpu.ops.operator import atx, ax, build_design
from vampomi_tpu.ops.pallas_matvec import atx_pallas, ax_pallas


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    m, n = 512, 256
    X = rng.normal(size=(m, n))
    dm = build_design(X, mesh=None, compute_dtype=jnp.float32)
    return dm


def test_atx_pallas_matches_einsum(problem):
    dm = problem
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=dm.n_samples), dtype=dm.wd)
    ref = np.asarray(atx(dm, y))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            atx_pallas(dm.X, y, dm.mave, dm.msig, dm.inv_sqrt_n)
        )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_ax_pallas_matches_einsum(problem):
    dm = problem
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=dm.m_pad), dtype=dm.wd)
    ref = np.asarray(ax(dm, x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            ax_pallas(dm.X, x, dm.mave, dm.msig, dm.inv_sqrt_n)
        )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)
