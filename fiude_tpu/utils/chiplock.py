"""Cross-process serialization of chip-touching jobs.

The axon tunnel serves ONE client well: concurrent builder jobs (sweeps,
head-to-head cells, benchmarks) contend for the chip and can starve the
driver's own bench run (the round-3 failure mode — see docs/BENCH.md).
Every entry point that initializes the TPU backend takes this flock first,
so at most one TPU job runs at a time; CPU-platform jobs skip it.

The lock is advisory and best-effort: ``chip_lock(timeout=...)`` yields
anyway after the timeout (with a warning) rather than deadlocking a caller
behind a crashed holder — FileLock releases on process death, so this only
triggers against a live long-running holder.
"""

from __future__ import annotations

import contextlib
import os
import sys

from filelock import FileLock, Timeout

CHIP_LOCK_PATH = os.environ.get("FIUDE_CHIP_LOCK", "/tmp/fiude_tpu_chip.lock")


@contextlib.contextmanager
def chip_lock(timeout: float = -1.0, *, proceed_on_timeout: bool = False):
    """Serialize a TPU-touching section across processes.

    timeout < 0 blocks indefinitely.  With ``proceed_on_timeout`` the
    section runs unserialized after the timeout instead of raising —
    appropriate for the driver-invoked bench, which must emit its artifact
    even if a stale holder never releases.
    """
    lock = FileLock(CHIP_LOCK_PATH)
    try:
        lock.acquire(timeout=timeout)
    except Timeout:
        if not proceed_on_timeout:
            raise
        print(f"[chiplock] timeout after {timeout}s waiting on "
              f"{CHIP_LOCK_PATH}; proceeding unserialized", file=sys.stderr,
              flush=True)
        yield
        return
    try:
        yield
    finally:
        lock.release()
