"""Tracing / profiling / runtime-checks — SURVEY.md §5 aux subsystems.

The reference's only observability is per-epoch wall-clock logging
(main_utils.py:185,246).  Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard/Perfetto-loadable trace of device + host activity.
* ``StepTimer`` — cheap per-step wall timing with pairs/sec accounting and
  JSONL emission through MetricWriter.
* ``StepProfiler`` — trace the first N train-step dispatches of a run
  (cfg.profile_steps) into <save_directory>/profile/.
* ``debug_mode()`` — NaN-checking context (``jax_debug_nans``; see
  debug_mode's note on donated buffers).
* ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` wrapper so pipeline
  stages show up in traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device/host profile to ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Scope annotation visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Trace the first N train-step dispatches into ``logdir``
    (cfg.profile_steps — wired into every trainer loop).

    ``step(value)`` starts the trace on its first call, counts one
    dispatch (a multi-step scan chunk counts as one), and on the Nth
    stops the trace after a HARD device sync (``jax.device_get`` of the
    step's loss — a data-dependent read is the only honest barrier
    through async dispatch, so the traced steps' device work is in the
    file).  ``close()`` stops early if the epoch ran out of batches.
    Traces open with ``tensorboard --logdir <logdir>``."""

    def __init__(self, logdir: str, steps: int):
        self.logdir = logdir
        self.remaining = int(steps)
        self.active = False

    def step(self, sync_value) -> None:
        if self.remaining <= 0:
            return
        if not self.active:
            jax.profiler.start_trace(self.logdir)
            self.active = True
        self.remaining -= 1
        if self.remaining == 0:
            self.close(sync_value)

    def close(self, sync_value=None) -> None:
        if not self.active:
            return
        if sync_value is not None:
            jax.device_get(sync_value)
        jax.profiler.stop_trace()
        self.active = False
        self.remaining = 0


@contextlib.contextmanager
def debug_mode(nan_checks: bool = True) -> Iterator[None]:
    """NaN-checking debugging context (toggles ``jax_debug_nans``).

    NOTE: this does NOT undo buffer donation — re-running a step whose
    inputs a jitted fn donated (make_mi_train_step, donate_argnums=0)
    still fails with a deleted-buffer error; rebuild the step without
    donation (make_mi_step_body + plain jax.jit) for replay debugging."""
    prev = jax.config.jax_debug_nans
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Per-step timing with throughput accounting.

    Measures wall time between ``tick()`` calls; because dispatch is async,
    sustained per-step times are only meaningful across a window — the
    window median is reported, matching bench.py methodology.
    """

    def __init__(self, batch_size: int, writer=None, window: int = 50):
        self.batch_size = batch_size
        self.writer = writer
        self.window = window
        self._times = []
        self._last: Optional[float] = None
        self.steps = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        self.steps += 1
        if self.writer is not None and self.steps % self.window == 0:
            self.writer.write(step=self.steps, pairs_per_sec=self.pairs_per_sec())

    def step_ms(self) -> float:
        if not self._times:
            return float("nan")
        s = sorted(self._times)
        return 1e3 * s[len(s) // 2]

    def pairs_per_sec(self) -> float:
        ms = self.step_ms()
        return self.batch_size / (ms / 1e3) if ms == ms and ms > 0 else float("nan")


def enable_fast_rng() -> None:
    """Hardware PRNG for dropout masks (~25% MI-step savings vs threefry)."""
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
