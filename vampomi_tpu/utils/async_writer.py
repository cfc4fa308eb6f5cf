"""Background device→host artifact pipeline.

Per-iteration artifact dumps (the reference writes x1_hat/√N and r1/√N every
iteration, src/vamp.cpp:234-252, plus our exact-state checkpoints) require a
device→host fetch of M-length vectors.  On the relayed TPU platform that
transfer runs at ~20-25 MB/s — seconds per iteration at M ~ 1e6, dwarfing the
~0.1 s of compute.  A single worker thread performs the fetch + file write
while the main thread dispatches the next iteration (jax arrays are immutable
and fetches are thread-safe), so artifact IO overlaps compute completely.

One worker preserves write order; exceptions surface on the next submit or
at flush().
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor


class AsyncWriter:
    def __init__(self):
        self._ex = ThreadPoolExecutor(max_workers=1, thread_name_prefix="artifact-io")
        self._pending: list[Future] = []

    def submit(self, fn, *args, **kwargs) -> None:
        # surface any failure from already-finished work before queueing more
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()
        self._pending.append(self._ex.submit(fn, *args, **kwargs))

    def flush(self) -> None:
        """Block until all queued writes are durably on disk; re-raise errors."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    def close(self) -> None:
        self.flush()
        self._ex.shutdown(wait=True)
