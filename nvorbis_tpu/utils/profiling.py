"""Lightweight tracing for the decode pipeline (SURVEY §5: the reference has
no profiler; its closest analog is the bit-accounting stats).

Spans accumulate wall time + call counts per label with ~100 ns overhead
when disabled.  Enable with ``NVT_TRACE=1`` (or :func:`enable`); the decode
engines wrap their phases (collect / unpack / dispatch / fetch) so a decode
prints a phase breakdown via :func:`report`.  For device-side profiles use
``jax.profiler.trace`` around a decode and inspect with TensorBoard —
:func:`device_trace` is a convenience wrapper.
"""

import contextlib
import os
import threading
import time
from collections import defaultdict

_enabled = os.environ.get("NVT_TRACE", "") not in ("", "0")
_lock = threading.Lock()
_spans = defaultdict(lambda: [0.0, 0])  # label -> [seconds, calls]


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def span(label: str):
    """Time a block under ``label`` (no-op unless tracing is enabled)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _spans[label]
            s[0] += dt
            s[1] += 1


def reset() -> None:
    with _lock:
        _spans.clear()


def snapshot():
    """{label: (seconds, calls)} accumulated since the last reset."""
    with _lock:
        return {k: tuple(v) for k, v in _spans.items()}


def report(stream=None) -> str:
    """Render (and optionally print) the span table, slowest first."""
    rows = sorted(snapshot().items(), key=lambda kv: -kv[1][0])
    width = max((len(k) for k, _ in rows), default=5)
    lines = [f"{'span':<{width}}  {'total_s':>9}  {'calls':>7}  {'ms/call':>8}"]
    for label, (sec, calls) in rows:
        lines.append(
            f"{label:<{width}}  {sec:>9.3f}  {calls:>7d}  "
            f"{sec / calls * 1e3:>8.2f}"
        )
    text = "\n".join(lines)
    if stream is not None:
        print(text, file=stream)
    return text


@contextlib.contextmanager
def device_trace(logdir: str):
    """Wrap a block in ``jax.profiler.trace`` (XLA device timeline)."""
    import jax

    with jax.profiler.trace(logdir):
        yield
