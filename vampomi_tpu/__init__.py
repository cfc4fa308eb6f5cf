"""vampomi_tpu — a TPU-native gVAMP (EM-flavored Vector Approximate Message
Passing) framework for omics-scale Bayesian regression.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference MPI/OpenMP C++ implementation
(medical-genomics-group/VAMPomi):

  * linear gVAMP inference with adaptive spike + Gaussian-mixture prior
    (reference: src/vamp.cpp)
  * probit (binary classification) GLM-VAMP (reference: src/vamp_probit.cpp)
  * out-of-sample testing, SE/LOO association testing, probit prediction
    (reference: src/main_meth.cpp, src/main_meth_probit.cpp)
  * marker-sharded distributed execution over a JAX device mesh — the
    TPU-native equivalent of the reference's MPI column sharding
    (reference: src/utilities.cpp:207-239 divide_work + MPI_Allreduce)

Design notes
------------
The reference fuses column standardization into an elementwise CPU matvec
(src/data.cpp:340-373).  Here the standardized operator

    A = (X - 1 mu^T) diag(1/sigma) / sqrt(N)

is decomposed algebraically into one large matmul (MXU) plus a rank-1
correction (VPU), so the hot path is a dense (M, N) matmul that XLA tiles
onto the systolic array.  Cross-device communication is a single psum of an
N-vector per A·x — identical communication volume to the reference's
MPI_Allreduce(N).

Scalar bookkeeping (gammas, EM statistics, reductions) is kept in float64;
the M×N design matrix lives in a configurable compute dtype (float32 /
bfloat16 on TPU, float64 for the CPU correctness oracle).
"""

import jax as _jax

# Scalar state (gam1/gam2/gamw, EM sufficient statistics, CG reductions) needs
# f64; the hot M×N arrays opt into narrower dtypes explicitly.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first compile of a full engine phase costs
# 20-120 s on the TPU; cached recompiles measured ~2x faster end-to-end.
# Opt out with VAMPOMI_NO_COMPILE_CACHE=1 or point VAMPOMI_COMPILE_CACHE at
# a different directory.
import os as _os
import tempfile as _tempfile

if _os.environ.get("VAMPOMI_NO_COMPILE_CACHE") != "1":
    # per-user, per-host-fingerprint default (see _cachedir): a world-shared
    # fixed path breaks for the second user on a multi-user machine, and CPU
    # executables must not outlive the machine that compiled them
    from ._cachedir import default_cache_dir as _default_cache_dir

    _jax.config.update("jax_compilation_cache_dir", _default_cache_dir())
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from . import sharding  # noqa: E402,F401
from . import ops  # noqa: E402,F401
from . import prior  # noqa: E402,F401
