"""Preemption-safe checkpointing: catch SIGTERM, save, resume mid-epoch.

TPU pods are preemptible: maintenance events and scheduler evictions
deliver SIGTERM to every worker host with a grace window (typically
30 s+).  The reference has no preemption story at all (SURVEY.md §5
"Failure detection ... none"); its checkpoints exist only to feed the
next pipeline stage.  Here the Managers poll :func:`requested` at step
boundaries — a host-side flag read, zero device work — and on a pending
signal save the FULL native train-state tree (params + all optimizer
states + step) and return early.  ``resume_from`` that checkpoint
continues mid-epoch: the Loader fast-forwards the deterministic batch
composition to ``step % steps_per_epoch`` without decoding the skipped
records (pipeline.Loader.epoch(start_batch=...)).

Multi-host: the cluster schedulers that preempt TPU pods signal every
worker, so each process observes its own flag; the flag is additionally
OR-reduced across processes at checkpoint-decision points
(:func:`should_stop` with ``sync=True``) so a save is only initiated
collectively — an orbax save with only some processes participating
would deadlock.  Single-process runs skip the collective entirely.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)

_flag = threading.Event()
_installed: dict = {}   # signum -> previous handler


def install(signals=(signal.SIGTERM,)) -> None:
    """Install (idempotent, chaining) handlers that set the preemption flag.

    Chains any previously registered handler so embedding applications
    keep their own shutdown logic.  Call once from the CLI entry points;
    library users who manage signals themselves can instead call
    :func:`request` from their own handler."""
    for sig in signals:
        if sig in _installed:
            continue
        previous = signal.getsignal(sig)

        def _handler(signum, frame, _prev=previous):
            logger.warning("signal %d received — checkpoint-and-exit at the "
                           "next step boundary", signum)
            _flag.set()
            if callable(_prev) and _prev not in (signal.SIG_IGN, signal.SIG_DFL):
                _prev(signum, frame)

        _installed[sig] = previous
        signal.signal(sig, _handler)


def uninstall() -> None:
    """Restore the pre-:func:`install` handlers (tests)."""
    for sig, prev in _installed.items():
        signal.signal(sig, prev)
    _installed.clear()


def request() -> None:
    """Programmatically request a preemption save (also used by tests)."""
    _flag.set()


def clear() -> None:
    _flag.clear()


def requested() -> bool:
    """Host-local flag read — free to poll every step."""
    return _flag.is_set()


def should_stop(sync: bool = False) -> bool:
    """True if ANY participating process has a pending preemption.

    ``sync=False`` (single-process, the default): a plain flag read.
    ``sync=True`` (multi-host): OR-reduce the flag across processes so
    every rank reaches the collective checkpoint save together even if
    the scheduler's signals arrive skewed.  Costs one tiny all-gather;
    call it at checkpoint-decision cadence (per step / per scan chunk),
    not in inner loops."""
    if not sync:
        return requested()
    import jax
    if jax.process_count() == 1:
        return requested()
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if requested() else 0], np.int32))
    return bool(np.any(flags))
