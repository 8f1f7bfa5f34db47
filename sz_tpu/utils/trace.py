"""Lightweight per-stage tracing (the reference has only ad-hoc
cost_start/cost_end timers in its CLI, example/sz.c:14-27; here every
pipeline stage is timed and can be dumped programmatically or via
SZ_TPU_TRACE=1).

Usage:
    with trace("quantize"):
        ...
    print(last_spans())
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_enabled = os.environ.get("SZ_TPU_TRACE", "") not in ("", "0")
_spans: list = []


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def reset() -> None:
    _spans.clear()


def last_spans() -> list:
    """[(name, seconds), ...] since the last reset()."""
    return list(_spans)


@contextlib.contextmanager
def trace(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _spans.append((name, dt))
        if len(_spans) > 4096:
            del _spans[:2048]
        if _enabled:
            print(f"[sz_tpu {name}: {dt * 1e3:.1f} ms]", file=sys.stderr,
                  flush=True)


# --- checksum-sync instrumentation -----------------------------------------
# jax.block_until_ready does NOT reliably synchronize through tunneled
# device links (BASELINE.md session 7): span times become dispatch-only.
# A bench/profiling harness installs a sync hook (typically an 8-element
# checksum download, which forces the producer to complete); engine
# stages call sync(arr) on their device outputs before the span closes,
# so spans measure DEVICE COMPUTE, not dispatch.  Default: no-op.
_sync_fn = None


def set_sync(fn) -> None:
    """Install (or clear, fn=None) the span sync hook: fn(jax_array)
    must force the array's producer to complete before returning."""
    global _sync_fn
    _sync_fn = fn


def sync(*arrs) -> None:
    if _sync_fn is None:
        return
    for a in arrs:
        if a is not None:
            _sync_fn(a)
