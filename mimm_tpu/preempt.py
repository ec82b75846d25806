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
from typing import Optional

logger = logging.getLogger(__name__)

_flag = threading.Event()
_installed: dict = {}   # signum -> previous handler
_sync_calls = 0         # should_stop(sync=True) throttle counter


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
    global _sync_calls
    _flag.clear()
    _sync_calls = 0


def resolve_resume(cfg, ckpt_name: str) -> Optional[str]:
    """Resolve ``cfg.resume_from`` for a trainer whose preemption
    checkpoint is ``<save_directory>/<ckpt_name>``: "" -> None (fresh
    run), "auto" -> that checkpoint when it exists else None, any other
    value -> itself (an explicit checkpoint path).  One place for the
    'auto' contract shared by every CLI entry point."""
    import os
    resume = getattr(cfg, "resume_from", "") or None
    if resume == "auto":
        candidate = os.path.join(cfg.save_directory, ckpt_name)
        resume = candidate if os.path.exists(candidate) else None
    return resume


def requested() -> bool:
    """Host-local flag read — free to poll every step."""
    return _flag.is_set()


def should_stop(sync: bool = False, sync_every: int = 8) -> bool:
    """True if ANY participating process has a pending preemption.

    ``sync=False`` (single-process, the default): a plain flag read.
    ``sync=True`` (multi-host): OR-reduce the flag across processes so
    every rank reaches the collective checkpoint save together even if
    the scheduler's signals arrive skewed.

    The OR-reduce is a BLOCKING cross-process all-gather + host fetch —
    doing it every step would reintroduce exactly the per-step host
    round trip the trainers accumulate losses on device to avoid.  So
    the collective runs only every ``sync_every``-th call (the counter
    advances identically on every rank — each rank makes the same
    call sequence per step — so participation stays symmetric); calls
    in between return False without reading even the local flag, since
    acting on a local-only flag would desynchronize the ranks.  Worst-
    case preemption latency is sync_every steps (a few seconds against
    a 30 s+ grace window)."""
    if not sync:
        return requested()
    import jax
    if jax.process_count() == 1:
        return requested()
    global _sync_calls
    _sync_calls += 1
    if _sync_calls % max(1, sync_every):
        return False
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if requested() else 0], np.int32))
    return bool(np.any(flags))
