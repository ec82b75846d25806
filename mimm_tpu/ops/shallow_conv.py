"""Pallas TPU kernel: the ResNet stem's shallow 3x3 convolution.

STATUS: measured SLOWER than the XLA stem once timing is device-bound —
ships OFF by default as a documented experiment.  Scan-chained full
tower step at B=64 (tools/bench_image_tower.py, 8 steps/dispatch):
XLA stem 7.16 ms vs this kernel 9.23 ms.  The round-2 "conv1 stage
4.3 -> 3.3 ms" win that put this kernel in production was measured
with single-step dispatches through the axon tunnel, i.e. it was
dispatch-latency variance, not device time (the same artifact that
inverted the pairwise-critic comparison — see ops/pairwise_critic.py).

Original motivation (single-dispatch numbers, kept for history): XLA's
conv emitter looked pathological for the stem's 1->8-channel 3x3
convolution at 256x256 (reference model.py:299-301 conv1): measured
1.6 ms forward / ~1.3 ms kernel-gradient at B=64 on v5e for 0.6 GFLOP of
work — because a contraction depth of 9 and 8 output channels leave the
MXU idle (tools/bench_image_tower.py).

A 1-input-channel conv is just 9 shifted scalar multiply-adds — pure VPU
work.  This kernel computes all C_out channels of one image per grid
step from a pre-padded input resident in VMEM:

    y[b, c, r, s] = sum_{dr, dc} w[dr, dc, c] * xp[b, r + dr, s + dc]

Output is (B, C, H, W) — channel-major, so the hot last-two dims tile
the VPU lanes perfectly; the consumer transposes to NHWC (XLA fuses that
relayout into the following BatchNorm pass).

Backward (custom VJP):
* dW: grid over batch, a (9, C) accumulator block revisited every step
  (zeroed at step 0).  Scalar sums are assembled with the same
  one-hot-matvec scatter the pairwise-critic kernel uses (dynamic
  sublane scatter is not lowerable; a (9,1)x(1,C) outer product is).
* dx: the transposed conv (flipped taps summed over channels), same
  9-shift structure.  On the training path the image input is data (no
  cotangent requested), so XLA dead-code-eliminates the dx kernel.

On non-TPU backends the kernels run in Pallas interpret mode (unit
tests on the CPU mesh — tests/test_shallow_conv.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimm_tpu.ops.common import interpret as _interpret


def _fwd_kernel(w_ref, xp_ref, out_ref):
    # w_ref: (9, C) f32 SMEM; xp_ref: (G, H+2, W+2) f32;
    # out_ref: (G, C, H, W) — G images per grid step (bigger DMAs; a
    # 1-image step left the pipeline issue-latency bound)
    g, c_out, h, w = out_ref.shape
    for i in range(g):
        xp = xp_ref[i]
        # hoist the 3 lane-offset rotates (expensive relayout) — the 3
        # sublane shifts per rotate are near-free
        cols = [xp[:, dc:dc + w] for dc in range(3)]
        shifts = [cols[dc][dr:dr + h, :]
                  for dr in range(3) for dc in range(3)]
        for c in range(c_out):
            acc = shifts[0] * w_ref[0, c]
            for k in range(1, 9):
                acc = acc + shifts[k] * w_ref[k, c]
            out_ref[i, c] = acc.astype(out_ref.dtype)


def _dw_kernel(xp_ref, dy_ref, dw_ref):
    # grid (B,): dw (9, C) accumulator block revisited every step
    c_out = dy_ref.shape[0]
    h, w = dy_ref.shape[1], dy_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xp = xp_ref[...]
    cols = [xp[:, dc:dc + w] for dc in range(3)]
    dys = [dy_ref[c].astype(jnp.float32) for c in range(c_out)]
    taps = jax.lax.broadcasted_iota(jnp.int32, (9, 1), 0)
    acc = jnp.zeros((9, c_out), jnp.float32)
    for k, (dr, dc) in enumerate(
            (dr, dc) for dr in range(3) for dc in range(3)):
        s = cols[dc][dr:dr + h, :]
        sums = [jnp.sum(s * dys[c], axis=(0, 1), keepdims=True)
                for c in range(c_out)]
        row = jnp.concatenate(sums, axis=1)               # (1, C)
        e_k = (taps == k).astype(jnp.float32)             # (9, 1)
        acc = acc + jnp.dot(e_k, row,
                            preferred_element_type=jnp.float32)
    dw_ref[...] += acc


def _dx_kernel(w_ref, dyp_ref, dx_ref):
    # dxp[r,s] = sum_{dr,dc,c} w[dr*3+dc, c] * dyp2[c, r + (2-dr), s + (2-dc)]
    hp, wp = dx_ref.shape
    c_out = dyp_ref.shape[0]
    acc = jnp.zeros((hp, wp), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            k = dr * 3 + dc
            for c in range(c_out):
                acc = acc + dyp_ref[c][2 - dr:2 - dr + hp,
                                       2 - dc:2 - dc + wp].astype(
                    jnp.float32) * w_ref[k, c]
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _fwd_call(xp, w9, out_dtype):
    b, hp, wp = xp.shape
    h, w = hp - 2, wp - 2
    c_out = w9.shape[1]
    g = 1  # images per grid step (4 measured no better through the tunnel)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((9, c_out), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, hp, wp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, c_out, h, w), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c_out, h, w), out_dtype),
        interpret=_interpret(),
    )(w9, xp)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _shallow_conv_core(xp, w9, out_dtype):
    return _fwd_call(xp, w9, out_dtype)


def _core_fwd(xp, w9, out_dtype):
    return _fwd_call(xp, w9, out_dtype), (xp, w9)


def _core_bwd(out_dtype, res, dy):
    xp, w9 = res
    b, hp, wp = xp.shape
    h, w = hp - 2, wp - 2
    c_out = w9.shape[1]
    dw = pl.pallas_call(
        _dw_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, hp, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, c_out, h, w), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, c_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, c_out), jnp.float32),
        interpret=_interpret(),
    )(xp, dy)

    dyp = jnp.pad(dy, ((0, 0), (0, 0), (2, 2), (2, 2)))
    dxp = pl.pallas_call(
        _dx_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((9, c_out), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, c_out, h + 4, w + 4), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, hp, wp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), xp.dtype),
        interpret=_interpret(),
    )(w9, dyp)
    return dxp, dw


_shallow_conv_core.defvjp(_core_fwd, _core_bwd)


def shallow_conv3x3(x: jax.Array, kernel: jax.Array,
                    out_dtype=jnp.bfloat16) -> jax.Array:
    """3x3 / stride-1 / pad-1 conv for C_in=1, NHWC in, **NCHW out**.

    ``x``: (B, H, W, 1); ``kernel``: (3, 3, 1, C) — the canonical
    nn.Conv parameter, untouched (f32 accumulation, so at least as
    accurate as the bf16 XLA conv it replaces).  Returns (B, C, H, W) in
    ``out_dtype``; transpose to NHWC at the consumer (XLA fuses the
    relayout into the next elementwise pass)."""
    xp = jnp.pad(x[..., 0].astype(jnp.float32), ((0, 0), (1, 1), (1, 1)))
    w9 = kernel.reshape(9, kernel.shape[-1]).astype(jnp.float32)
    return _shallow_conv_core(xp, w9, out_dtype)
