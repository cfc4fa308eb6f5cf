"""Default persistent-compilation-cache directory (jax-free helper).

XLA:CPU executables encode the compile host's ISA extensions; restoring
this container onto a host with a different feature set makes cached CPU
entries fail at load time with "Machine type used for XLA:CPU compilation
doesn't match the machine type for execution" (observed 2026-08-18 after a
container migration poisoned the shared cache and broke the bench
supervisor's CPU child).  Folding a hash of the CPU feature set into the
default cache dir gives each distinct host its own cache instead of a
poisoned shared one.  Kept import-light (no jax) so doctor.py can compute
the path without initializing a backend.
"""

from __future__ import annotations

import hashlib
import os
import platform
import tempfile


def host_fingerprint() -> str:
    """Short hash of the CPU feature set (machine arch + /proc/cpuinfo flags)."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    ident += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(ident.encode()).hexdigest()[:8]


def default_cache_dir() -> str:
    """The cache dir vampomi_tpu configures when VAMPOMI_COMPILE_CACHE is unset.

    Per-user (a world-shared fixed path breaks for the second user on a
    multi-user machine) and per-host-fingerprint (see module docstring).
    """
    return os.environ.get(
        "VAMPOMI_COMPILE_CACHE",
        os.path.join(
            tempfile.gettempdir(),
            f"vampomi_jax_cache_{os.getuid()}_{host_fingerprint()}",
        ),
    )
