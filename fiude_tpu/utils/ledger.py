"""Crash-resumable sweep ledger (reference ``started.txt`` + FileLock).

The reference coordinates 24-36 worker processes through a file-locked text
ledger: claim a config by appending its prefix, mark it ``finished``/
``failed`` afterwards (``run_ode.py:106-119,167-170``,
``lib/utils.py:58-67``).  On TPU the sweep itself is device-parallel, but the
host-side ledger is retained for *crash resumability* and multi-host
elasticity — same claim/mark protocol, same file format.

Two interchangeable backends:

* **native** (default when g++ is available): ``native/ledger.cpp`` via
  ctypes — one flock-guarded read-scan-append per claim, no Python-level
  polling.  It locks the same ``<path>.lock`` file with ``flock(2)`` that
  the Python backend's ``filelock`` uses (fcntl.flock under the hood, lock
  file never deleted), so native and Python processes exclude each other
  correctly on a shared ledger.
* **python**: ``filelock.FileLock`` + plain file IO (always available).

Equivalence and cross-backend mutual exclusion are pinned by
``tests/test_native_ledger.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

from filelock import FileLock

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ledger.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libledger.so")

_native_lock = threading.Lock()
_native_lib: Optional[ctypes.CDLL] = None
_native_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _native_lib, _native_failed
    with _native_lock:
        if _native_lib is not None or _native_failed:
            return _native_lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                # compile to a private temp path and rename into place:
                # rename is atomic, so a concurrent worker can never dlopen
                # a half-written .so (N sweep workers race this on startup)
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True)
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.ledger_claim.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.ledger_claim.restype = ctypes.c_int
            lib.ledger_mark.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_char_p]
            lib.ledger_mark.restype = ctypes.c_int
            _native_lib = lib
        except Exception:
            _native_failed = True
            _native_lib = None
        return _native_lib


class Ledger:
    def __init__(self, path: str = "started.txt",
                 use_native: Optional[bool] = None):
        """``use_native``: None = auto (native when it compiles/loads),
        True = require the native backend, False = pure Python."""
        self.path = path
        self.lock = FileLock(path + ".lock")
        if use_native is False:
            self._lib = None
        else:
            self._lib = _load_native()
            if use_native is True and self._lib is None:
                raise RuntimeError("native ledger backend unavailable "
                                   "(g++ missing or compile failed)")

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "python"

    def _read(self) -> List[str]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, "r") as fh:
            return fh.read().splitlines()

    @staticmethod
    def _matches(line: str, key: str) -> bool:
        """A ledger line belongs to ``key`` iff it is the key itself or the
        key followed by status words.  The reference's substring test
        (``run_ode.py:109-119`` ``if save_name in t``) false-positives when
        one key prefixes another (e.g. ``cfg1`` vs ``cfg10``) — delimiter
        matching fixes that without changing the file format."""
        return line == key or line.startswith(key + " ")

    def claim(self, key: str) -> bool:
        """Atomically claim ``key``; False if already claimed."""
        if self._lib is not None:
            rc = self._lib.ledger_claim(self.path.encode(), key.encode())
            if rc >= 0:
                return bool(rc)
            # fall through to the Python path on IO error
        with self.lock:
            lines = self._read()
            for line in lines:
                if self._matches(line, key):
                    return False
            with open(self.path, "a") as fh:
                fh.write(key + "\n")
            return True

    def mark(self, key: str, status: str = "finished") -> None:
        """Append a status to the claimed line (lib/utils.py:58-67)."""
        if self._lib is not None:
            rc = self._lib.ledger_mark(self.path.encode(), key.encode(),
                                       status.encode())
            if rc >= 0:
                return
        with self.lock:
            lines = self._read()
            with open(self.path, "w") as fh:
                for line in lines:
                    if self._matches(line, key):
                        line = line.rstrip("\n") + " " + status
                    fh.write(line + "\n")

    def status(self, key: str) -> Optional[str]:
        for line in self._read():
            if self._matches(line, key):
                parts = line[len(key):].strip()
                return parts or "claimed"
        return None

    def entries(self) -> List[str]:
        return self._read()
