"""Multi-host (DCN) scaling hooks.

The reference has no distributed backend at all (its "cluster" is N OS
processes + a file-locked ledger — SURVEY §2.3); TPU-native, multi-host
sweeps run one jax program per host over DCN with ICI collectives inside
each slice.  This module wraps ``jax.distributed`` initialization and
host-0-only side effects so every driver works unchanged single-host
(no-op) or multi-host.

Intra-slice collectives are inserted by XLA from shardings
(``parallel.train_step``); the host filesystem ledger
(``utils.ledger.Ledger``) remains the cross-host work queue — same protocol
the reference used between processes, now between hosts on a shared FS.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host env vars/args are present.

    Returns True when running multi-host.  Safe to call unconditionally:
    single-host (no coordinator configured) is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def is_primary_host() -> bool:
    return jax.process_index() == 0


def primary_only(fn):
    """Decorator: run side-effecting host code (results tables, checkpoints)
    on host 0 only."""
    def wrapper(*args, **kwargs):
        if is_primary_host():
            return fn(*args, **kwargs)
        return None
    return wrapper
