"""On-device image normalization + compact-batch widening.

Compact transfer (cfg.compact_transfer): the host pipeline ships each
image as its un-normalized integer crop (uint8/uint16 — 1-2 bytes/pixel
instead of a 4-byte float) and narrow token arrays (uint16 ids, uint8
masks/segments), and the jitted train step widens and normalizes ON
DEVICE.  The math is identical to the host path (native/mimm_host.cpp
normalize_inplace / transforms.max_normalize): float32 cast, then divide
by max(1e-3, per-image max).  Integer sources <= 65535 are exact in
float32, so the device result is bit-identical to the host result —
verified in tests/test_compact_transfer.py.

Why: the per-batch host->device image transfer is the largest host-side
byte stream in training (B=64 float32 256^2 = 16.8 MB/batch); shipping
uint8/uint16 halves or quarters it.  XLA fuses the widen+normalize into
the first convolution's input pipeline, so device cost is nil.
"""

from __future__ import annotations

import jax.numpy as jnp


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """float32 cast + per-image divide by max(1e-3, image max).

    No-op for floating inputs (already normalized on host).  Handles both
    (B, H, W, C) batches and (K, B, H, W, C) stacked scan chunks — the
    per-image axes are always the trailing three.
    """
    if jnp.issubdtype(images.dtype, jnp.floating):
        return images
    x = images.astype(jnp.float32)
    axes = tuple(range(x.ndim - 3, x.ndim))
    m = jnp.max(x, axis=axes, keepdims=True)
    return x / jnp.maximum(m, jnp.float32(1e-3))


_WIDEN = {"txt_ids": jnp.int32, "txt_masks": jnp.int32,
          "txt_segments": jnp.int32}


def decompact_batch(batch: dict) -> dict:
    """Widen a compact-transfer batch to the step's working dtypes:
    normalize integer images, cast narrow token arrays to int32.  Exact
    (values are preserved); a no-op on already-wide batches."""
    out = dict(batch)
    if "image" in out:
        out["image"] = device_normalize(out["image"])
    for k, dt in _WIDEN.items():
        if k in out and out[k].dtype != dt:
            out[k] = out[k].astype(dt)
    return out
