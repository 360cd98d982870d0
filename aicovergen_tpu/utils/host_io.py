"""Background host I/O: overlap device->host stem downloads and WAV-cache
writes with device compute.

The reference pipeline serializes GPU compute against disk I/O — every stage
writes its WAV before the next starts (reference src/mdx.py:272-280,
src/main.py:166-203).  Here cache files are written by a single background
thread while the next device stage runs; `join()` (called before the
pipeline touches or deletes those files and before it returns) surfaces any
writer error in the caller.

One worker thread keeps writes ordered and bounds host memory: each queued
job usually holds the only host copy of one stem.
"""

from __future__ import annotations

import logging
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, List


class AsyncWriter:
    """Serial background executor for cache-file writes."""

    def __init__(self) -> None:
        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="aicg-writer")
        self._pending: List[Future] = []

    def submit(self, fn: Callable, *args, **kwargs) -> None:
        self._pending.append(self._pool.submit(fn, *args, **kwargs))

    def join(self) -> None:
        """Wait for all queued writes; re-raises the first failure."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    def close(self) -> None:
        self.join()
        self._pool.shutdown(wait=True)

    def __enter__(self) -> "AsyncWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # on an exception unwind, still drain the queue but do not mask the
        # original error with a writer error — log it instead so a failed
        # cache write (disk full, bad path) leaves a trace
        try:
            self.close()
        except Exception:
            if exc_type is None:
                raise
            logging.getLogger("aicovergen.host_io").exception(
                "async write failed while unwinding from another error"
            )
