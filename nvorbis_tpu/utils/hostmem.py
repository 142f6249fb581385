"""Host memory policy: recycle pages instead of re-faulting them.

On the hosts this library targets (VM guests restored from snapshots,
demand-paged by the hypervisor), the *first* write to a newly provisioned
anonymous page costs 100-600 us — three orders of magnitude above a warm
write.  Measured here (tools/host_ceiling.py, 2026-08-17): a fresh-buffer
memmove sustains ~10-30 MB/s while the identical copy into already-touched
pages runs at 7-9 GB/s.

Decode pipelines are exactly the worst case for that: every chunk stages
fresh numpy arrays, every device->host fetch lands in a freshly malloc'd
host buffer, and glibc returns big buffers to the OS on free
(mmap/munmap), so the same cost is paid over and over — it never warms up.

:func:`enable_page_recycling` flips glibc to serve *all* allocations from
the brk heap and never trim it (``mallopt(M_MMAP_MAX, 0)`` +
``M_TRIM_THRESHOLD`` at max).  Freed buffers then stay resident and the
next chunk's staging arrays — and the PJRT client's fetch landing buffers,
which go through the same malloc — reuse warm pages.  Cost: the process
holds its peak heap forever (bounded by a few chunks of staging + the
decoded PCM in flight).  Measured effect on the 8-stream host-plane
ceiling: 65x -> 556x realtime (tools/host_ceiling.py).

``NVT_NO_MALLOPT=1`` opts out (embedding applications that manage their
own allocator policy).  No-op off Linux/glibc.
"""

import ctypes
import os

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4


def enable_page_recycling() -> bool:
    """Apply the allocator policy once per process; True when active."""
    global _done
    if _done:
        return True
    if os.environ.get("NVT_NO_MALLOPT", "") not in ("", "0"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(_M_MMAP_MAX, 0)
        # INT_MAX (mallopt takes an int): never trim below ~2 GB of heap.
        # The round-3 value (1 GB) sat BELOW a 64-stream fleet's ~1.2 GB
        # working set, so end-of-decode frees trimmed the top of the heap
        # and the next decode re-paid first-touch faults — measured as the
        # batch64 config warming 195x -> 265x -> 439x over constructions.
        ok &= libc.mallopt(_M_TRIM_THRESHOLD, 0x7FFFFFFF)
    except (OSError, AttributeError):
        return False
    _done = bool(ok)
    return _done
