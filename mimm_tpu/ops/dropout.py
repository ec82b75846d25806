"""Byte-packed dropout — bandwidth-efficient Bernoulli masks.

Standard ``jax.random.bernoulli`` draws one uint32 per element: for the MI
step's ~1.3G dropout decisions (12 layers of (B, 12, L, L) attention probs
plus hidden dropouts) that is ~5 GB/step of random-bit traffic, measured
at ~40 ms on v5e.  Here each uint32 provides FOUR 8-bit thresholds, so
RNG generation and traffic drop 4x; keep-probability resolution is 1/256,
which is inconsequential for dropout regularization (p=0.1 -> realized
keep rate within 0.2%).

Semantics: per-element Bernoulli(1-rate) mask with 1/(1-rate) scaling,
exactly like nn.Dropout; only the threshold resolution differs.

MEASURED DEAD END under the production hardware PRNG (cfg.rng_impl=
"unsafe_rbg", BERT_VARIANTS=dropout tools/bench_bert_variants.py on v5e,
B=64): packed is 2-3x SLOWER than plain nn.Dropout (47.1 vs 23.5 ms
full text-tower step at L=64; 100.9 vs 36.7 at L=128) — the byte
unpack/stack/compare chain costs far more than the random bits it saves
once RNG is hardware-backed.  Plain dropout's total residual cost is
~2.1/4.6 ms at L=64/128 (vs deterministic), which is semantics-required.
Kept off by default (cfg.packed_dropout) as a documented negative
result; do not re-enable without new evidence.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def packed_dropout(x: jax.Array, rate: float, rng: jax.Array,
                   deterministic: bool = False) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    if rate >= 1.0:  # nn.Dropout parity: everything dropped, no inf from
        return jnp.zeros_like(x)  # the byte threshold capping at 255
    keep_prob = 1.0 - rate
    # 8-bit threshold: keep iff byte >= rate*256
    threshold = jnp.uint32(min(255, int(round(rate * 256.0))))

    n = x.size
    n_words = -(-n // 4)
    bits = jax.random.bits(rng, (n_words,), jnp.uint32)
    bytes4 = jnp.stack([(bits >> (8 * k)) & 0xFF for k in range(4)], axis=1)
    keep = (bytes4.reshape(-1)[:n] >= threshold).reshape(x.shape)
    return jnp.where(keep, x / keep_prob, jnp.zeros_like(x))


class PackedDropout(nn.Module):
    """Drop-in replacement for nn.Dropout using byte-packed masks."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return packed_dropout(x, self.rate, rng, deterministic=False)


def u8_dropout(x: jax.Array, rate: float, rng: jax.Array,
               deterministic: bool = False) -> jax.Array:
    """Dropout from uint8 random bytes: ``jax.random.bits(..., uint8)``
    compares one BYTE per element against a fixed threshold — 4x less
    random-bit generation/traffic than nn.Dropout's uint32-per-element
    draw, with NO unpack/stack relayout (the chain that made
    ``packed_dropout`` a measured dead end).  Keep-probability resolution
    is 1/256 (p=0.1 realizes keep 230/256 = 0.8984, 0.17% off), the same
    disclosed-approximation class as cfg.gelu_tanh.

    Motivation (tools/bench_bert_variants.py BERT_VARIANTS=cliff, v5e
    B=64): the text-tower step jumps 36.5 -> 50.8 ms from L=128 to L=136
    and dropout accounts for ~15 ms of the step at L=160 (64.6 vs 49.6
    deterministic) — the uint32 bit volume crosses an XLA fusion/spill
    threshold right above B*L=8192."""
    if deterministic or rate == 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    keep_prob = 1.0 - rate
    threshold = jnp.uint8(min(255, int(round(rate * 256.0))))
    bits = jax.random.bits(rng, x.shape, jnp.uint8)
    return jnp.where(bits >= threshold, x / keep_prob, jnp.zeros_like(x))


class U8Dropout(nn.Module):
    """Drop-in replacement for nn.Dropout using uint8 thresholds."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return u8_dropout(x, self.rate, rng, deterministic=False)
