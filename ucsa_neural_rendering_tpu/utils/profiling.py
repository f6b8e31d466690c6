"""Profiling / tracing subsystem.

Equivalent of the reference's opt-in Lightning AdvancedProfiler
(ref: scripts/pretrain.py:89-94, gated by exp["trainer"]["profiler"]):
here it is a `jax.profiler` TensorBoard trace plus a lightweight per-step
wall-clock timer that appends to `profile_steps.jsonl` — on-device op
breakdown from the trace, host-side step cadence from the timer.
"""

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def maybe_trace(enabled: bool, logdir: str):
    """jax.profiler.trace when enabled, else no-op."""
    if not enabled:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Per-step wall-clock logger (JSONL). Call tick(tag) around phases."""

    def __init__(self, path: str | None):
        self._f = open(path, "a") if path else None
        self._t = time.perf_counter()

    def tick(self, tag: str, **extra):
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        if self._f is not None:
            rec = {"tag": tag, "seconds": dt}
            rec.update(extra)
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        return dt

    def close(self):
        if self._f is not None:
            self._f.close()
