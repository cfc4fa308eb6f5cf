"""Exact-state checkpoint / resume.

The reference's only resume mechanism is the per-iteration estimate dumps
plus `--estimate-file`/`--gam1` warm starts (SURVEY §5.4).  This module adds
the full-state variant the survey calls for: one `.npz` holding every array
and scalar needed to continue the trajectory exactly — r1/r2/x1/x2, the CG
warm start, gammas/taus, the (masked) prior, and the probe RNG key.

Checkpoints are written atomically (tmp + rename) so a killed run never
leaves a torn file.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..prior.mixture import MixturePrior

FORMAT_VERSION = 1


def save_checkpoint(path: str, *, iteration: int, arrays: dict, scalars: dict,
                    prior: MixturePrior, key, meta: dict | None = None) -> None:
    """Write the checkpoint atomically.  Multi-host: only process 0 writes
    (every process holds identical replicated state; concurrent writers on a
    shared filesystem would tear the file)."""
    if jax.process_index() != 0:
        return
    payload = {
        "__version__": np.asarray(FORMAT_VERSION),
        "__iteration__": np.asarray(iteration),
        "prior_probs": np.asarray(prior.probs),
        "prior_vars": np.asarray(prior.vars),
        "prior_active": np.asarray(prior.active),
        "rng_key": np.asarray(jax.random.key_data(key)),
    }
    for k, v in arrays.items():
        payload["arr_" + k] = np.asarray(v)
    for k, v in scalars.items():
        payload["scl_" + k] = np.asarray(float(v))
    for k, v in (meta or {}).items():
        payload["meta_" + k] = np.asarray(v)
    tmp = f"{path}.{os.getpid()}.tmp"  # unique per writer process
    with open(tmp, "wb") as f:  # explicit handle: savez must not append .npz
        np.savez(f, **payload)
        f.flush()
        os.fsync(f.fileno())  # data durable BEFORE the rename is journaled
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        version = int(z["__version__"])
        if version != FORMAT_VERSION:
            raise ValueError(f"checkpoint version {version} != {FORMAT_VERSION}")
        out = {
            "iteration": int(z["__iteration__"]),
            "prior": dict(
                probs=z["prior_probs"], vars=z["prior_vars"], active=z["prior_active"]
            ),
            "rng_key": z["rng_key"],
            "arrays": {},
            "scalars": {},
            "meta": {},
        }
        for k in z.files:
            if k.startswith("arr_"):
                out["arrays"][k[4:]] = z[k]
            elif k.startswith("scl_"):
                out["scalars"][k[4:]] = float(z[k])
            elif k.startswith("meta_"):
                out["meta"][k[5:]] = z[k]
    return out


def check_meta(ck: dict, **expected) -> None:
    """Fail fast on a mismatched resume (different dataset shape or model)
    instead of an opaque jit shape error or a silently wrong trajectory."""
    for k, v in expected.items():
        got = ck.get("meta", {}).get(k)
        if got is None:
            continue  # older checkpoint without metadata: best effort
        got = got.item() if hasattr(got, "item") else got
        if str(got) != str(v):
            raise ValueError(
                f"checkpoint {k}={got!r} does not match this run's {k}={v!r}"
            )


def restore_key(key_data: np.ndarray):
    return jax.random.wrap_key_data(np.asarray(key_data, dtype=np.uint32))
