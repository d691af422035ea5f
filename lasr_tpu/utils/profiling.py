"""Profiling / tracing hooks.

The reference has only commented-out cuda-synchronize wall-clock probes
(ref:nnutils/mesh_net.py:177-178,293-294, ref:nnutils/train_utils.py:271-272);
here tracing is a first-class subsystem: `trace()` wraps a region in a
jax.profiler trace (viewable in TensorBoard / Perfetto), and `timed()` gives
device-synchronized wall-clock sections for quick CLI numbers."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sync_on=None):
    """Wall-clock a region, synchronizing on `sync_on` (pytree) at exit."""
    t0 = time.time()
    yield
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    print(f"[timed] {label}: {time.time() - t0:.3f}s")


def annotate(name: str):
    """Named sub-region inside a trace (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
