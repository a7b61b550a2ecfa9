"""Host allocator tuning for large-array workloads.

On sandboxed hosts (gVisor-style kernels) each first-touch page fault costs
~0.5ms, so glibc's default policy — large numpy buffers via mmap, munmap'd on
free — makes every fresh gigabyte cost ~2 minutes of system time.  Routing
large allocations through the (never-trimmed) heap means pages fault once and
are reused for the life of the process: measured 13.6s -> 2.7s per 768MB
fill on this class of host.

Called from the benchmark/CLI entry points; deliberately NOT at library
import (a library shouldn't silently change process-wide malloc policy).
"""

from __future__ import annotations

import ctypes
import logging

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4


def tune_host_allocator() -> bool:
    """Best-effort glibc mallopt tuning; returns True if applied."""
    try:
        libc = ctypes.CDLL(None)
        ok = True
        ok &= bool(libc.mallopt(_M_MMAP_MAX, 0))
        ok &= bool(libc.mallopt(_M_MMAP_THRESHOLD, 2**31 - 1))
        ok &= bool(libc.mallopt(_M_TRIM_THRESHOLD, 2**31 - 1))
        return ok
    except Exception as exc:  # non-glibc platforms: harmless no-op
        logging.getLogger("syzgydb.hostmem").debug(
            "mallopt unavailable: %s", exc)
        return False
