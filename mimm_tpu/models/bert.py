"""TextBert — BERT text encoder with a pooled-[CLS] head (flax.linen).

Capability parity with the reference (``mutual_info_img_txt/model.py:54-105``):
a pytorch_transformers-1.0.0-style BertModel (post-LayerNorm encoder, gelu,
learned position + token-type embeddings, tanh pooler over [CLS]) followed
by dropout and a linear classifier head.  ``__call__`` returns
``(pooled_output, logits)`` exactly like the reference forward
(model.py:68-81).

TPU-first: attention is a single ``jnp.einsum`` chain that XLA fuses and
tiles onto the MXU; compute dtype is configurable (bfloat16 for training);
no data-dependent control flow, static ``max_seq_length`` shapes.

Weight ingestion from pytorch_transformers-format checkpoints
(``pytorch_model.bin``) is in mimm_tpu.checkpoint (the reference's required
``bert_pretrain_all_notes_150000`` dir is absent from its repo —
SURVEY.md C13 — so random init must also be supported, as here).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mimm_tpu.ops.dropout import PackedDropout, U8Dropout


def _dropout(cfg, rate: float):
    if getattr(cfg, "u8_dropout", False):
        return U8Dropout(rate)
    return PackedDropout(rate) if cfg.packed_dropout else nn.Dropout(rate)


def _sp(x, sharding):
    """Megatron-style sequence-parallel activation constraint: pin a
    (B, L, H) activation to ``sharding`` (sequence axis over the 'model'
    mesh axis, parallel/mesh.py seq_sharding).  Placed at the LayerNorm/
    dropout/residual regions, it makes GSPMD lower each tensor-parallel
    all-reduce into reduce-scatter + all-gather and shards the elementwise
    passes.  No-op (None) outside an SP run — eval, serving, single-chip.
    Also a no-op when a constrained dimension is not divisible by its mesh
    axis (e.g. the batch-1 trace inside model.init) — shapes are static at
    trace time, so this never hides a runtime mis-shard."""
    if sharding is None:
        return x
    axis_size = dict(sharding.mesh.shape)
    for dim, name in enumerate(sharding.spec):
        if name is not None and x.shape[dim] % axis_size[name] != 0:
            return x
    return jax.lax.with_sharding_constraint(x, sharding)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Mirror of pytorch_transformers BertConfig fields used by the reference."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    num_classes: int = 1
    # byte-packed dropout masks (experimental, ops/dropout.py): 4x less
    # RNG generation but the byte-interleave relayout measured SLOWER than
    # plain masks on v5e (384 vs 169 ms/step) — off by default.
    packed_dropout: bool = False
    # uint8-threshold dropout masks (ops/dropout.py u8_dropout): 4x less
    # random-bit volume with no unpack relayout; keep-prob resolution
    # 1/256 (disclosed approximation, same class as gelu_tanh).  Fixes
    # the L>128 dropout step-time cliff (BERT_VARIANTS=cliff).
    u8_dropout: bool = False
    # TPU-native: rematerialize each encoder layer in the backward pass
    # (drops the O(B * heads * L^2) attention-prob activations from HBM;
    # ~1/3 extra forward FLOPs buys 4x larger global batches).
    remat: bool = False
    # TPU-native: run the three QKV projections as one fused
    # (hidden, 3*hidden) matmul (same params/checkpoint layout; the
    # concatenated weight is materialized in-flight).
    fused_qkv: bool = True
    # softmax accumulation dtype for attention probs: 'float32' (reference
    # parity, default) or 'bfloat16' (faster relayouts; max-subtracted so
    # numerically safe for L=320).
    softmax_dtype: str = "float32"
    # fused Pallas attention (ops/flash_attention.py): scores/softmax/
    # dropout/context in one kernel, probs+masks never reach HBM; f32
    # softmax inside, dropout drawn from the on-core PRNG.
    flash_attention: bool = False
    # whole-sample flash grid: one grid step per SAMPLE with an unrolled
    # per-head loop instead of a (sample, head) grid — amortizes
    # per-grid-step kernel overhead (ops/flash_attention.py _ws_*
    # kernels; dropout masks bit-identical to the (b, h) grid).  Engaged
    # for L <= flash_whole_sample_max_len (0 = never).  Measured v5e
    # B=64 BERT step (fwd+bwd+opt, u8 dropout, round 5): ws beats the
    # (b,h) grid at every probed length and beats einsum at L=320
    # (113.6 vs flash 120.0 vs einsum 131.3 ms); einsum still wins
    # L<=192 (53.3/63.1 vs ws 56.4/63.7 at 160/192), so the
    # flash_min_seq_len=256 dispatch gate stands and every
    # flash-dispatched length uses the ws grid.
    flash_whole_sample_max_len: int = 512
    # Only use the Pallas kernel at/above this sequence length.  Measured
    # on v5e (B=64, fwd+bwd+opt, bf16-operand kernel): the XLA einsum path
    # wins below ~192 (L=128: 36.6 vs 48.2 ms) because the kernel's
    # (batch, head) grid of tiny (L, 64) blocks underutilizes the MXU; at
    # L=192 the two are at parity (76.8 vs 74.1, within tunnel noise), and
    # at L=320 the kernel's avoided (B, H, L, L) prob/mask HBM roundtrips
    # dominate (123.5 vs 158.1 ms) — BERT_VARIANTS=flash
    # tools/bench_bert_variants.py.
    flash_min_seq_len: int = 256
    # tanh-approximated GELU (production perf knob): XLA's erf lowering
    # costs 2.8/5.6 ms per step at L=64/128 (B=64, v5e) while the tanh
    # form runs at the relu floor — a 10-13% step saving.  |gelu_tanh -
    # gelu_erf| <= 1e-3 absolute (max near |x|~2), i.e. at bfloat16
    # working precision the two mostly round to the same value.  Parity
    # paths (f32 goldens, reference-step oracle) keep the exact erf form
    # that pytorch_transformers BERT defines.
    gelu_tanh: bool = False
    # fused FFN Pallas kernel (ops/fused_ffn.py): GEMM -> tanh-GELU ->
    # GEMM with both weight matrices resident in VMEM.  Measured SLOWER
    # than XLA's FFN on v5e at every bucket length (see the op's module
    # docstring for the A/B table) — off by default, kept as a documented
    # experiment.  Requires gelu_tanh (Mosaic has no erf primitive);
    # checkpoint tree is unchanged.
    fused_ffn: bool = False

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "BertConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        raw = {k: v for k, v in raw.items() if k in known}
        if "vocab_size_or_config_json_file" in raw:  # v1.0.0 field name
            raw["vocab_size"] = raw.pop("vocab_size_or_config_json_file")
        raw.update(overrides)
        return cls(**raw)

    # standard BertConfig attributes only — the TPU execution knobs below
    # (remat/fused_qkv/flash/gelu_tanh/...) don't belong in a config.json
    # a pytorch_transformers consumer might read
    _ARCH_FIELDS = ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size", "hidden_act",
                    "hidden_dropout_prob", "attention_probs_dropout_prob",
                    "max_position_embeddings", "type_vocab_size",
                    "initializer_range", "layer_norm_eps", "num_classes")

    def to_json_file(self, path: str) -> str:
        """Write the architecture config — the counterpart of the
        reference's ``bert_config.save_pretrained(save_directory)`` inside
        ``ImageReportModel.save_pretrained`` (model.py:584)."""
        with open(path, "w") as f:
            json.dump({k: getattr(self, k) for k in self._ARCH_FIELDS},
                      f, indent=2, sort_keys=True)
            f.write("\n")
        return path


def _bert_init(stddev):
    return nn.initializers.normal(stddev=stddev)


class _DenseParams(nn.Module):
    """Holds a Dense layer's kernel/bias with standard naming but without
    binding the matmul — lets the attention block fuse QKV into one matmul
    while keeping the checkpoint tree identical to three nn.Dense modules."""

    in_features: int
    features: int
    kernel_init: Any

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_bias, *, deterministic: bool):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        init = _bert_init(cfg.initializer_range)
        b = hidden.shape[0]

        if cfg.fused_qkv:
            wq, bq = _DenseParams(h, h, init, name="query")()
            wk, bk = _DenseParams(h, h, init, name="key")()
            wv, bv = _DenseParams(h, h, init, name="value")()
            w_qkv = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            b_qkv = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = hidden @ w_qkv + b_qkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            dense = lambda name: nn.Dense(h, dtype=self.dtype, kernel_init=init,
                                          name=name)
            q, k, v = (dense("query")(hidden), dense("key")(hidden),
                       dense("value")(hidden))
        q = q.reshape(b, -1, nh, hd)
        k = k.reshape(b, -1, nh, hd)
        v = v.reshape(b, -1, nh, hd)

        seq_len = q.shape[1]
        if cfg.flash_attention and seq_len >= cfg.flash_min_seq_len \
                and seq_len % 8 == 0 and hd % 8 == 0:
            from mimm_tpu.ops.flash_attention import flash_attention
            rate = cfg.attention_probs_dropout_prob if not deterministic else 0.0
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1, 1), 0,
                                          jnp.iinfo(jnp.int32).max, jnp.int32)
            else:
                seed = jnp.zeros((1, 1), jnp.int32)
            bias_row = attn_bias[:, 0, 0, :].astype(jnp.float32)     # (B, L)
            ws = seq_len <= getattr(cfg, "flash_whole_sample_max_len", 0)
            ctx = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3), bias_row, seed, rate,
                                  ws)
            return ctx.transpose(0, 2, 1, 3).reshape(b, -1, h)

        scores = jnp.einsum("bqnd,bknd->bnqk", q, k) / jnp.sqrt(hd).astype(self.dtype)
        scores = scores + attn_bias
        if cfg.softmax_dtype == "float32":
            probs = jax.nn.softmax(
                scores.astype(jnp.promote_types(scores.dtype, jnp.float32)),
                axis=-1).astype(self.dtype)
        else:
            scores = scores - jax.lax.stop_gradient(
                jnp.max(scores, axis=-1, keepdims=True))
            probs = jax.nn.softmax(scores, axis=-1)
        probs = _dropout(cfg, cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, -1, h)
        return ctx


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    # sequence-parallel activation sharding (parallel/mesh.py seq_sharding);
    # None = no constraint (single-chip, eval, plain TP)
    sp_sharding: Any = None

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool = True):
        cfg = self.config
        init = _bert_init(cfg.initializer_range)
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                       name=name)
        drop = _dropout(cfg, cfg.hidden_dropout_prob)

        attn_out = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(
            hidden, attn_bias, deterministic=deterministic)
        attn_out = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                            name="attention_output")(attn_out)
        # SP: constrain the row-parallel projection output to seq-sharded —
        # GSPMD emits a reduce-scatter here instead of an all-reduce, and
        # the dropout + residual + LN below run on 1/tp of the tokens.
        attn_out = _sp(drop(attn_out, deterministic=deterministic),
                       self.sp_sharding)
        hidden = _sp(ln("attention_layernorm")(hidden + attn_out),
                     self.sp_sharding)

        if cfg.fused_ffn and cfg.gelu_tanh:
            from mimm_tpu.ops.fused_ffn import fused_ffn
            # Same param tree as the two nn.Dense modules below; only the
            # matmul binding changes (cf. the fused_qkv pattern above).
            w1, b1 = _DenseParams(cfg.hidden_size, cfg.intermediate_size,
                                  init, name="intermediate")()
            w2, b2 = _DenseParams(cfg.intermediate_size, cfg.hidden_size,
                                  init, name="output")()
            flat = hidden.reshape(-1, cfg.hidden_size)
            out = fused_ffn(flat, w1.astype(self.dtype), b1.astype(self.dtype),
                            w2.astype(self.dtype), b2.astype(self.dtype))
            out = out.reshape(hidden.shape)
        else:
            inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                             kernel_init=init, name="intermediate")(hidden)
            inter = nn.gelu(inter, approximate=cfg.gelu_tanh)
            out = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                           name="output")(inter)
        out = _sp(drop(out, deterministic=deterministic), self.sp_sharding)
        return _sp(ln("output_layernorm")(hidden + out), self.sp_sharding)


class BertModel(nn.Module):
    """Post-LN BERT encoder + tanh pooler (pytorch_transformers 1.0.0 layout)."""

    config: BertConfig
    dtype: Any = jnp.float32
    sp_sharding: Any = None  # sequence-parallel constraint, see BertLayer

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 *, deterministic: bool = True):
        cfg = self.config
        init = _bert_init(cfg.initializer_range)
        b, s = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=init,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(s)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=init, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
                       dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        hidden = word + pos + tok
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="embeddings_layernorm")(hidden)
        hidden = _sp(_dropout(cfg, cfg.hidden_dropout_prob)(
            hidden, deterministic=deterministic), self.sp_sharding)

        # (B, 1, 1, S) additive mask, -10000 on padding (pytorch_transformers parity)
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(self.dtype)) * -10000.0

        layer_cls = nn.remat(BertLayer, static_argnums=(3,)) if cfg.remat else BertLayer
        for i in range(cfg.num_hidden_layers):
            hidden = layer_cls(cfg, dtype=self.dtype, name=f"layer{i}",
                               sp_sharding=self.sp_sharding)(
                hidden, attn_bias, deterministic)

        cls = hidden[:, 0]
        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                          name="pooler")(cls)
        pooled = jnp.tanh(pooled)
        return hidden, pooled


class TextBert(nn.Module):
    """BertModel -> dropout -> classifier head; returns (pooled, logits)
    (reference model.py:54-89)."""

    config: BertConfig
    dtype: Any = jnp.float32
    sp_sharding: Any = None  # sequence-parallel constraint, see BertLayer

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 *, deterministic: bool = True):
        _, pooled = BertModel(self.config, dtype=self.dtype, name="bert",
                              sp_sharding=self.sp_sharding)(
            input_ids, token_type_ids, attention_mask, deterministic=deterministic)
        pooled = pooled.astype(jnp.promote_types(pooled.dtype, jnp.float32))
        dropped = _dropout(self.config, self.config.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = nn.Dense(self.config.num_classes,
                          kernel_init=_bert_init(self.config.initializer_range),
                          name="classifier")(dropped)
        return pooled, logits


def build_bert_model(bert_pretrained_dir: str, bert_config_name: str,
                     output_channels: int, dtype: Any = jnp.float32):
    """Factory matching reference build_bert_model (model.py:92-105):
    reads ``bert_config.json`` from the pretrained dir and injects
    ``num_classes``.  Returns (module, config); params come from
    checkpoint.load_bert_pytorch_bin or module.init."""
    config_path = os.path.join(bert_pretrained_dir, bert_config_name)
    config = BertConfig.from_json_file(config_path, num_classes=output_channels)
    return TextBert(config, dtype=dtype), config
