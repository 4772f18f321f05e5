"""glibc malloc tuning for hosts with slow fresh-page supply.

On this class of VM (virtio free-page reporting), anonymous pages
returned to the hypervisor refault at ~40 MB/s while pages retained in
the process are reused at full speed. Large numpy/PyBytes buffers
normally go through mmap and are munmapped on free, so every
per-contig decompress/copy cycle pays the slow refault path again —
measured 8x end-to-end on a 9.6M-read run, and a bare 600 MB
`ndarray.copy()` at 19 s cold vs 0.2 s from a retained arena.

Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps big allocations in
the brk arena and keeps the arena's pages after free: the process pays
the fault cost once at its high-water mark and reuses warm pages
thereafter. RSS then holds at the peak working set, which is the
deliberate trade (set DELLY_TPU_MALLOC_ARENA=0 to opt out on
memory-constrained hosts).
"""

from __future__ import annotations

import ctypes
import os

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def apply() -> bool:
    """Raise glibc's mmap/trim thresholds (idempotent). Returns True
    if the tunables were set."""
    global _done
    if _done:
        return True
    if os.environ.get("DELLY_TPU_MALLOC_ARENA", "1") == "0":
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        libc.mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
        libc.mallopt.restype = ctypes.c_int
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _done = bool(ok1 and ok2)
    except Exception:
        return False
    return _done
