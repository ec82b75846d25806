"""Shared Pallas-kernel helpers."""

import jax


def interpret() -> bool:
    """True when Pallas kernels should run in interpret mode — any
    non-TPU backend (e.g. the 8-device CPU test mesh).  Single source of
    truth: every ops module imports this predicate so a change (say, a
    new TPU-like platform name) lands everywhere at once."""
    return jax.default_backend() != "tpu"
