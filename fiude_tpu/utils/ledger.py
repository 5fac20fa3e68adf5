"""Crash-resumable sweep ledger (reference ``started.txt`` + FileLock).

The reference coordinates 24-36 worker processes through a file-locked text
ledger: claim a config by appending its prefix, mark it ``finished``/
``failed`` afterwards (``run_ode.py:106-119,167-170``,
``lib/utils.py:58-67``).  On TPU the sweep itself is device-parallel, but the
host-side ledger is retained for *crash resumability* and multi-host
elasticity — same claim/mark protocol, same file format.
"""

from __future__ import annotations

import os
from typing import List, Optional

from filelock import FileLock


class Ledger:
    def __init__(self, path: str = "started.txt"):
        self.path = path
        self.lock = FileLock(path + ".lock")

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
