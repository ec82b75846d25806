"""Fused BERT FFN Pallas kernel: GEMM -> tanh-GELU -> GEMM in one pass.

STATUS: measured SLOWER than the XLA path on v5e — ships OFF by default
as a documented experiment (BertConfig.fused_ffn).  Full BERT step
(fwd+bwd+AdamW, B=64, tanh-GELU baseline vs this kernel,
tools/bench_bert_variants.py BERT_VARIANTS=ffn, 2026-08-17):
L=64: 23.4 -> 26.5 ms; L=96: 29.9 -> 30.0; L=128: 36.7 -> 39.6;
L=320: 124.3 -> 127.1.  Conclusion: XLA already fuses the GELU into the
GEMM epilogues and its FFN emission is at or above Mosaic's GEMM
throughput, so the hoped-for intermediate-HBM-traffic savings don't
materialize as wall-clock (same finding as the pure-GEMM roof probe:
XLA's GEMM chain hits 227.7 TFLOPS).  Kept because the kernel is exact
(f32 parity tests) and the negative result is load-bearing for future
perf work.

Original motivation: the FFN owns 2/3 of BERT's matmul FLOPs, and the
XLA path materializes the (T, 3072) intermediates in HBM; with both
weight matrices resident in VMEM (w1 + w2 = 9.4 MB bf16) the whole
intermediate lives on-chip per row tile.  FLOP count is IDENTICAL to
the XLA path (no recompute): the backward pass reuses the saved
pre-GELU activation ``h``.

Kernels (grid over row tiles of the token dimension T = B*L):

* forward:   h = x @ w1 + b1 ; y = gelu_tanh(h) @ w2 + b2
             (outputs y and h — h is the only saved residual)
* bwd A:     dg = dy @ w2^T ; dh = dg * gelu'(h) ; dx = dh @ w1^T
             (outputs dx and dh)
* bwd B1:    dw1 = x^T @ dh ; db1 = sum(dh)   (f32 accumulator = out ref)
* bwd B2:    dw2 = gelu_tanh(h)^T @ dy        (f32 accumulator = out ref)

B1/B2 split by OUTPUT so their input sets ((x, dh) vs (h, dy)) are
disjoint — no operand is read twice across the backward.  db2 = sum(dy)
is left to XLA (it fuses with the surrounding elementwise chain).

Only the tanh-approximated GELU is supported: Mosaic has no ``erf``
primitive, and the production configuration (BertConfig.gelu_tanh) uses
the tanh form anyway; parity paths keep the XLA erf FFN.

Numerics: f32 GEMM accumulation throughout; dw1/db1/dw2 accumulate in
f32 out refs across row tiles (same accumulation dtype as one big XLA
GEMM, different summation order) and are cast to the param dtype
outside.  ``h`` is saved in the compute dtype, so in float32 the op is
bit-comparable to the unfused formula (tests/test_fused_ffn.py); in
bfloat16 gelu'(h) sees an h rounded to bf16 — well inside the
production knob's disclosed tolerance.

On non-TPU backends the kernels run in Pallas interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimm_tpu.ops.common import interpret as _interpret

# Row-tile sizes, chosen so weights (9.4 MB bf16) + activation tiles +
# f32 temporaries stay under VMEM: forward holds one (TILE, F) f32
# intermediate; bwd A holds two.
_FWD_TILE = 128
_BWD_A_TILE = 64
_BWD_B_TILE = 128

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def _gelu_tanh(h):
    u = _SQRT_2_OVER_PI * (h + _GELU_C * h * h * h)
    return 0.5 * h * (1.0 + jnp.tanh(u))


def _dgelu_tanh(h):
    u = _SQRT_2_OVER_PI * (h + _GELU_C * h * h * h)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * h * h)
    return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, h_ref):
    h = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    h_ref[...] = h.astype(h_ref.dtype)
    g = _gelu_tanh(h).astype(x_ref.dtype)
    y = jnp.dot(g, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_a_kernel(dy_ref, h_ref, w1_ref, w2_ref, dx_ref, dh_ref):
    # dg = dy @ w2^T ; dh = dg * gelu'(h) ; dx = dh @ w1^T
    dg = jax.lax.dot_general(dy_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = dg * _dgelu_tanh(h_ref[...].astype(jnp.float32))
    dh_c = dh.astype(dh_ref.dtype)
    dh_ref[...] = dh_c
    dx = jax.lax.dot_general(dh_c, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _bwd_b1_kernel(x_ref, dh_ref, dw1_ref, db1_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    dh = dh_ref[...]
    dw1_ref[...] += jax.lax.dot_general(
        x_ref[...], dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)


def _bwd_b2_kernel(dy_ref, h_ref, dw2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    g = _gelu_tanh(h_ref[...].astype(jnp.float32)).astype(dy_ref.dtype)
    dw2_ref[...] += jax.lax.dot_general(
        g, dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _row_spec(tile, cols):
    return pl.BlockSpec((tile, cols), lambda i: (i, 0))


def _resident(shape):
    """Whole-array block with a grid-independent index map — fetched once
    and kept resident in VMEM across row-tile steps."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _pad_rows(a, tile):
    t = a.shape[0]
    pad = (-t) % tile
    return (jnp.pad(a, ((0, pad), (0, 0))), t) if pad else (a, t)


@jax.custom_vjp
def fused_ffn(x, w1, b1, w2, b2):
    """tanh-GELU FFN: ``gelu(x @ w1 + b1) @ w2 + b2``.

    ``x``: (T, d); ``w1``: (d, f); ``b1``: (f,); ``w2``: (f, d);
    ``b2``: (d,).  d and f must be multiples of 128 (hardware lanes);
    T is padded internally to the row-tile size.
    """
    return _ffn_fwd(x, w1, b1, w2, b2)[0]


def _ffn_fwd(x, w1, b1, w2, b2):
    d, f = w1.shape
    xp, t = _pad_rows(x, _FWD_TILE)
    y, h = pl.pallas_call(
        _fwd_kernel,
        grid=(xp.shape[0] // _FWD_TILE,),
        in_specs=[_row_spec(_FWD_TILE, d), _resident((d, f)), _resident((1, f)),
                  _resident((f, d)), _resident((1, d))],
        out_specs=[_row_spec(_FWD_TILE, d), _row_spec(_FWD_TILE, f)],
        out_shape=[jax.ShapeDtypeStruct((xp.shape[0], d), x.dtype),
                   jax.ShapeDtypeStruct((xp.shape[0], f), x.dtype)],
        interpret=_interpret(),
    )(xp, w1, b1[None, :], w2, b2[None, :])
    return y[:t], (x, w1, w2, h[:t])


def _ffn_bwd(res, dy):
    x, w1, w2, h = res
    d, f = w1.shape

    dyp, t = _pad_rows(dy, _BWD_A_TILE)
    hp, _ = _pad_rows(h, _BWD_A_TILE)
    dx, dh = pl.pallas_call(
        _bwd_a_kernel,
        grid=(dyp.shape[0] // _BWD_A_TILE,),
        in_specs=[_row_spec(_BWD_A_TILE, d), _row_spec(_BWD_A_TILE, f),
                  _resident((d, f)), _resident((f, d))],
        out_specs=[_row_spec(_BWD_A_TILE, d), _row_spec(_BWD_A_TILE, f)],
        out_shape=[jax.ShapeDtypeStruct((dyp.shape[0], d), dy.dtype),
                   jax.ShapeDtypeStruct((dyp.shape[0], f), dy.dtype)],
        interpret=_interpret(),
    )(dyp, hp, w1, w2)
    dx, dh = dx[:t], dh[:t]

    # Padded rows of dh/dy are exactly zero (dg = 0 @ w2^T), so the
    # dw/db accumulations over padded tiles are unaffected.
    xp, _ = _pad_rows(x, _BWD_B_TILE)
    dhp, _ = _pad_rows(dh, _BWD_B_TILE)
    dw1, db1 = pl.pallas_call(
        _bwd_b1_kernel,
        grid=(xp.shape[0] // _BWD_B_TILE,),
        in_specs=[_row_spec(_BWD_B_TILE, d), _row_spec(_BWD_B_TILE, f)],
        out_specs=[_resident((d, f)), _resident((1, f))],
        out_shape=[jax.ShapeDtypeStruct((d, f), jnp.float32),
                   jax.ShapeDtypeStruct((1, f), jnp.float32)],
        interpret=_interpret(),
    )(xp, dhp)

    dyp2, _ = _pad_rows(dy, _BWD_B_TILE)
    hp2, _ = _pad_rows(h, _BWD_B_TILE)
    dw2 = pl.pallas_call(
        _bwd_b2_kernel,
        grid=(dyp2.shape[0] // _BWD_B_TILE,),
        in_specs=[_row_spec(_BWD_B_TILE, d), _row_spec(_BWD_B_TILE, f)],
        out_specs=_resident((f, d)),
        out_shape=jax.ShapeDtypeStruct((f, d), jnp.float32),
        interpret=_interpret(),
    )(dyp2, hp2)

    db2 = jnp.sum(dy.astype(jnp.float32), axis=0)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(w1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype))


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)
