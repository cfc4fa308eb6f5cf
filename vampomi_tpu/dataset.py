"""Dataset assembly: file slabs → mesh-sharded DesignMatrix + phenotype.

The reference's `data` class couples file reading, standardization
statistics and the matvec (src/data.cpp:24-47).  Here loading is host-side
numpy (per-host slab reads of the shared marker-major `.bin`), and the
operator lives in ops/operator.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh

from .config import RunConfig
from .io.bin_io import read_meth_bin, read_meth_bin_stats
from .io.phen import Phenotype, read_covariates, read_phen
from .ops.operator import DesignMatrix, build_design, inv_sd_from_sumsq
from .sharding import divide_work, pad_to_multiple


class Dataset(NamedTuple):
    dm: DesignMatrix
    phen: Phenotype
    covariates: np.ndarray | None
    # per-marker dequantization scale (length Mt f64) when dm.X holds affine-
    # quantized codes; None for float designs.  The LOO association add-back
    # (modes/association.py pvals_loo) needs it to express the reference's
    # raw-marker coefficient in code space.
    qscale: np.ndarray | None = None


def load_dataset(
    meth_file: str,
    phen_file: str,
    n: int,
    mt: int,
    model: str,
    mesh: Mesh | None,
    compute_dtype,
    alpha_scale: float = 1.0,
    cov_file: str = "",
    c: int = 0,
) -> Dataset:
    """Load a (train or test) dataset.

    Single-process: reads the full (Mt, N) matrix.  Multi-host: each process
    reads only the marker rows covering its addressable shards of the padded
    global array — the analog of the reference's per-rank slab read at offset
    S·N·8 (src/data.cpp:116-153).
    """
    standardize = model != "bin_class"  # reference src/data.cpp:40-43
    phen = read_phen(phen_file, n, standardize=standardize)

    covs = None
    if c > 0 and cov_file:
        covs = read_covariates(cov_file, c, n)

    low_prec = np.dtype(compute_dtype).itemsize < 8

    def _load(count, start):
        """(X, stats) — fused native ingest+statistics when the target is a
        low-precision X (one threaded pass over the f64 file), else the f64
        read + numpy statistics."""
        if low_prec:
            fused = read_meth_bin_stats(meth_file, n, count, start_marker=start)
            if fused is not None:
                X, mave, sumsq = fused
                return X, (mave, inv_sd_from_sumsq(sumsq, n, alpha_scale))
        return read_meth_bin(meth_file, n, count, start_marker=start), None

    if mesh is None or jax.process_count() == 1:
        X, stats = _load(mt, 0)
        qinfo: dict = {}
        dm = build_design(
            X, mesh=mesh, compute_dtype=compute_dtype,
            alpha_scale=alpha_scale, mt=mt, stats=stats, quant_out=qinfo,
        )
        return Dataset(
            dm=dm, phen=phen, covariates=covs, qscale=qinfo.get("scale")
        )

    # Multi-host path: equal padded shards per process (contiguous in the
    # 1-D marker mesh), each host reads only its own rows that exist on disk.
    n_dev = int(np.prod(mesh.devices.shape))
    m_pad = pad_to_multiple(mt, n_dev)
    per_proc = m_pad // jax.process_count()
    pidx = jax.process_index()
    lo, hi = pidx * per_proc, (pidx + 1) * per_proc
    real_hi = min(hi, mt)
    stats = None
    if lo < mt:
        rows, st = _load(real_hi - lo, lo)
        # buffer dtype follows the loader: f32 from the fused native ingest,
        # f64 otherwise (so numpy statistics stay bit-faithful to the file);
        # pad-free shards (the common case) use the loaded slab directly
        # instead of doubling peak host memory with a copy
        if rows.shape[0] == per_proc:
            local = rows
        else:
            local = np.zeros((per_proc, n), dtype=rows.dtype)
            local[: real_hi - lo] = rows
        if st is not None:
            mave_l = np.zeros(per_proc)
            msig_l = np.zeros(per_proc)
            mave_l[: real_hi - lo], msig_l[: real_hi - lo] = st
            stats = (mave_l, msig_l)
    else:
        local = np.zeros((per_proc, n), dtype=np.float64)
    # build_design's single-host path can't be used here; construct shards
    # via make_array_from_process_local_data inside build_design_multihost.
    from .ops.operator import build_design_multihost

    qinfo = {}
    dm = build_design_multihost(
        local, lo, mt, m_pad, n, mesh, compute_dtype, alpha_scale,
        stats=stats, quant_out=qinfo,
    )
    qscale = None
    if "scale_local" in qinfo:
        # every process needs the GLOBAL scale (the LOO add-back indexes
        # markers globally); shards are contiguous per process, so an
        # allgather + flatten reconstructs marker order.  This path only
        # runs with process_count() > 1 (the single-process case returned
        # above), so the allgather is unconditional.
        from jax.experimental import multihost_utils

        qscale = np.asarray(
            multihost_utils.process_allgather(qinfo["scale_local"])
        ).reshape(-1)[:mt]
    return Dataset(dm=dm, phen=phen, covariates=covs, qscale=qscale)


def rank_slab(mt: int) -> tuple[int, int]:
    """(M, S) for this process under reference `divide_work` semantics —
    used only for byte-offset parity in file IO helpers."""
    parts = divide_work(mt, max(jax.process_count(), 1))
    return parts[jax.process_index()]
