"""Fused attention kernel (scores + mask + softmax + dropout + context).

Why: profiling the MI step on v5e showed ~40 ms/step of dropout mask
traffic plus the f32 attention-prob HBM roundtrips (12 layers of
(B, 12, L, L)).  This kernel keeps the entire (L, L) score/prob tile in
VMEM per (batch, head) grid step and draws the dropout mask with the
on-core PRNG (pltpu.prng_random_bits) — probabilities and masks never
touch HBM in either direction.

Shapes: for the reference workload L=320, D=64 a whole head is tiny
(Q/K/V 40 KB each, scores 400 KB f32), so there is no online-softmax
tiling; the grid is simply (batch, heads).  The backward kernel recomputes
probs with the SAME per-(b,h) PRNG seed, so the dropout mask in the
backward pass is bit-identical to the forward one.

Numerics: scores/softmax in float32 (reference parity), inputs/outputs
bfloat16-friendly.  Gradient wrt the additive mask bias is not needed
(it derives from constant attention masks) and is returned as zeros.

Parity: tests/test_flash_attention.py checks fwd+bwd against the XLA
einsum path with dropout off, and mask statistics with dropout on.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimm_tpu.ops.common import interpret as _interpret


def _probs(q, k, bias_row, scale):
    # q/k stay in their input dtype (bfloat16 in production): the MXU runs
    # bf16 x bf16 at full rate with float32 accumulation
    # (preferred_element_type), vs ~1/4 rate for f32 x f32 operands.  The
    # XLA einsum path computes scores the same way (bf16 operands, f32
    # accumulate), so this is parity-neutral; softmax stays float32.
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (L, L)
    s = s * scale + bias_row            # bias broadcasts (1, L) -> (L, L)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_mask(seed_ref, rate: float, shape):
    """Deterministic per-(b,h) keep mask in {0, 1/keep}."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    pltpu.prng_seed(seed_ref[0, 0] + b * nh + h)
    bits = pltpu.prng_random_bits(shape)  # int32 bits
    # uniform in [0, 2^32) as uint32; keep iff >= rate * 2^32
    threshold = jnp.uint32(min(0xFFFFFFFF, int(rate * 4294967296.0)))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _fwd_kernel(rate, scale, q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    p = _probs(q, k, bias_ref[0], scale)
    if rate > 0.0:
        p = p * _dropout_mask(seed_ref, rate, p.shape)
    # probs cast to the input dtype for the PV dot (the XLA path also
    # feeds bf16 probs to its context einsum); f32 accumulation
    o_ref[0, 0, :, :] = jnp.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32) \
        .astype(o_ref.dtype)


def _bwd_kernel(rate, scale, q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    # matmul operands stay in the input dtype (bf16 at full MXU rate, f32
    # accumulation) — see _probs; the softmax VJP math runs in f32
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    in_dtype = q.dtype
    p = _probs(q, k, bias_ref[0], scale)
    if rate > 0.0:
        m = _dropout_mask(seed_ref, rate, p.shape)
        pd = p * m                                   # dropped probs (fwd value)
    else:
        m = None
        pd = p
    # dV = pd^T do
    dv_ref[0, 0, :, :] = jax.lax.dot_general(
        pd.astype(in_dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # d(pd) = do V^T ;  dp = d(pd) * mask
    dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dp = dpd * m if m is not None else dpd
    # softmax vjp: ds = p * (dp - sum(dp * p, axis=-1))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(in_dtype)
    dq_ref[0, 0, :, :] = jnp.dot(ds, k, preferred_element_type=jnp.float32) \
        .astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _specs(B, H, L, D):
    qkv = pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0))
    # bias rides as (B, 1, L): the block's trailing dims then equal the
    # array dims, satisfying Mosaic's (8,128)-or-full tiling rule.
    bias = pl.BlockSpec((1, 1, L), lambda b, h: (b, 0, 0))
    seed = pl.BlockSpec((1, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM)
    return qkv, bias, seed


# ---- whole-sample variant: grid (B,), all H heads per step -------------
# At L < 256 a (b, h) grid step's matmuls are tiny ((L, D) @ (D, L) with
# D=64 — half-idle MXU) and the kernel is overhead/pipeline-bound; one
# grid step per SAMPLE amortizes that over the heads with an UNROLLED
# per-head loop of the same 2D dots the default kernel runs (VMEM cost
# H*L*D*(3 inputs + 1 out) + one (L, L) f32 score tile at a time —
# bert-base L=192: ~0.9 MB + 150 KB, comfortably scoped).  The dropout
# mask per head is seeded exactly like the (b, h) grid (seed + b*H + h),
# so both variants draw bit-identical masks.

def _ws_head_seed(seed_ref, h, H):
    return seed_ref[0, 0] + pl.program_id(0) * H + h


def _ws_fwd_kernel(rate, scale, q_ref, k_ref, v_ref, bias_ref, seed_ref,
                   o_ref):
    H = q_ref.shape[1]
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        p = _probs(q, k, bias_ref[0], scale)
        if rate > 0.0:
            pltpu.prng_seed(_ws_head_seed(seed_ref, h, H))
            bits = pltpu.prng_random_bits(p.shape)
            threshold = jnp.uint32(min(0xFFFFFFFF,
                                       int(rate * 4294967296.0)))
            keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
            p = p * jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)),
                              jnp.float32(0.0))
        o_ref[0, h, :, :] = jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32) \
            .astype(o_ref.dtype)


def _ws_bwd_kernel(rate, scale, q_ref, k_ref, v_ref, bias_ref, seed_ref,
                   do_ref, dq_ref, dk_ref, dv_ref):
    H = q_ref.shape[1]
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        in_dtype = q.dtype
        p = _probs(q, k, bias_ref[0], scale)
        if rate > 0.0:
            pltpu.prng_seed(_ws_head_seed(seed_ref, h, H))
            bits = pltpu.prng_random_bits(p.shape)
            threshold = jnp.uint32(min(0xFFFFFFFF,
                                       int(rate * 4294967296.0)))
            keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
            m = jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)),
                          jnp.float32(0.0))
            pd = p * m
        else:
            m = None
            pd = p
        dv_ref[0, h, :, :] = jax.lax.dot_general(
            pd.astype(in_dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dp = dpd * m if m is not None else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(in_dtype)
        dq_ref[0, h, :, :] = jnp.dot(ds, k,
                                     preferred_element_type=jnp.float32) \
            .astype(dq_ref.dtype)
        dk_ref[0, h, :, :] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _ws_specs(B, H, L, D):
    qkv = pl.BlockSpec((1, H, L, D), lambda b: (b, 0, 0, 0))
    # bias rides as (B, 1, L), same as the (b, h) grid — trailing dims
    # equal the array dims for Mosaic's tiling rule
    bias = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0))
    seed = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    return qkv, bias, seed


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention(q, k, v, bias, seed, rate: float = 0.0,
                    whole_sample: bool = False):
    """q,k,v: (B, H, L, D); bias: (B, L) additive key bias; seed: (1,1) int32.
    Returns context (B, H, L, D).  ``rate``: dropout on the attention probs.
    ``whole_sample``: grid over (B,) with all H heads batched per step
    instead of (B, H) — amortizes per-step overhead at short L where the
    per-head matmuls are tiny (BertConfig.flash_whole_sample)."""
    return _fa_fwd(q, k, v, bias, seed, rate, whole_sample)[0]


def _host_mask(seed, rate, shape):
    """CPU-interpret fallback for the dropout mask (pltpu.prng_seed has no
    CPU lowering): same {0, 1/keep} semantics, different bit stream than
    the on-core PRNG — TPU and CPU masks are each deterministic per seed
    but not identical to each other."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0, 0])
    keep = jax.random.bernoulli(key, 1.0 - rate, shape)
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _host_attention(q, k, v, bias, seed, rate):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        p = p * _host_mask(seed, rate, p.shape)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _fa_fwd(q, k, v, bias, seed, rate, whole_sample=False):
    if _interpret() and rate > 0.0:
        return _host_attention(q, k, v, bias, seed, rate), (q, k, v, bias, seed)
    B, H, L, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if whole_sample:
        qkv, bias_s, seed_s = _ws_specs(B, H, L, D)
        out = pl.pallas_call(
            partial(_ws_fwd_kernel, rate, scale),
            grid=(B,),
            in_specs=[qkv, qkv, qkv, bias_s, seed_s],
            out_specs=qkv,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=_interpret(),
        )(q, k, v, bias[:, None, :], seed)
        return out, (q, k, v, bias, seed)
    qkv, bias_s, seed_s = _specs(B, H, L, D)
    out = pl.pallas_call(
        partial(_fwd_kernel, rate, scale),
        grid=(B, H),
        in_specs=[qkv, qkv, qkv, bias_s, seed_s],
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias[:, None, :], seed)
    return out, (q, k, v, bias, seed)


def _fa_bwd(rate, whole_sample, res, do):
    q, k, v, bias, seed = res
    if _interpret() and rate > 0.0:
        _, vjp = jax.vjp(lambda a, b, c: _host_attention(a, b, c, bias, seed,
                                                         rate), q, k, v)
        dq, dk, dv = vjp(do)
        return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed)
    B, H, L, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if whole_sample:
        qkv, bias_s, seed_s = _ws_specs(B, H, L, D)
        dq, dk, dv = pl.pallas_call(
            partial(_ws_bwd_kernel, rate, scale),
            grid=(B,),
            in_specs=[qkv, qkv, qkv, bias_s, seed_s, qkv],
            out_specs=[qkv, qkv, qkv],
            out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
            interpret=_interpret(),
        )(q, k, v, bias[:, None, :], seed, do)
        return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed)
    qkv, bias_s, seed_s = _specs(B, H, L, D)
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, rate, scale),
        grid=(B, H),
        in_specs=[qkv, qkv, qkv, bias_s, seed_s, qkv],
        out_specs=[qkv, qkv, qkv],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=_interpret(),
    )(q, k, v, bias[:, None, :], seed, do)
    return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
