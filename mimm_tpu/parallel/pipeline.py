"""Pipeline parallelism for the BERT text tower — GPipe-style microbatch
scheduling over a 'pipe' mesh axis, written as a `shard_map` + `ppermute`
collective program.

No reference counterpart (the reference is single-device, SURVEY.md §2);
this completes the mesh-parallelism family alongside dp (batch over
'data'), tp (Megatron shardings over 'model') and sp (sequence-sharded
activations): pp splits the text tower's DEPTH across stages.

What pp buys in this build: the pipeline shards COMPUTE and backward
ACTIVATIONS depth-wise (each stage materializes activations only for its
num_layers/S local layers), and — when the Manager/dryrun restack the
train state via :func:`stack_resident_text_state` — the RESIDENT text
parameters and AdamW moment trees live 'pipe'-sharded too (1/S per
chip), with no per-step re-stacking copy.  Checkpoints ALWAYS keep the
plain unstacked layout (the save path unstacks, resume restacks), so
nothing about the on-disk contract changes.  The ZeRO knobs compose
over the 'data' axis for the remaining replicated trees:
``cfg.zero1_optimizer_sharding`` (image/critic moments 1/dp per chip)
and ``cfg.fsdp_parameter_sharding`` (image at-rest params 1/dp) — the
driver dryrun runs pp + fsdp + zero1 together.  For bert-base at CXR
report lengths a single v5e chip fits the whole model anyway; pp here
is the execution schedule (and its equivalence proof) for towers whose
per-layer activations are the binding constraint — and, unlike the
dp-axis ZeRO knobs, the resident stacking still shards state on a
PURE-pipe mesh (dp=1).  Expert parallelism remains out of scope: this
model family has no MoE structure to shard.

Design (the classic JAX pipelining recipe, cf. jax shard_map docs and the
scaling-book's pipelining chapter):

* the per-layer parameter trees ``layer0..layerN-1`` are stacked in-flight
  onto a leading (num_layers,) axis and sharded over 'pipe', so each stage
  holds ``num_layers / S`` contiguous layers (the stacking is a cheap
  HBM-bandwidth copy inside the jitted step; checkpoints keep the plain
  unstacked layout, so nothing about the on-disk contract changes);
* the (B, L, H) activations are split into M microbatches; stage s
  processes microbatch ``t - s`` at tick t and hands its output to stage
  ``s+1`` via ``ppermute`` — M + S - 1 ticks total, bubble fraction
  (S-1)/(M+S-1);
* only the last stage's outputs are real; a masked ``psum`` over 'pipe'
  replicates them to every stage so downstream (pooler/critic) code sees
  an ordinary replicated activation;
* the backward pass needs no hand scheduling: autodiff transposes the
  ``ppermute`` chain into the reverse pipeline automatically.

Dropout under pp draws DIFFERENT (but equally valid) masks than the plain
schedule: keys are folded per (global layer, microbatch) instead of per
flax module path.  Equivalence tests therefore run deterministically;
training semantics (rate, independence) are unchanged.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mimm_tpu.models.bert import BertConfig, BertLayer
from mimm_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def pipeline_stage_count(mesh) -> int:
    """Pipeline stages = size of the mesh's 'pipe' axis (1 = no pp)."""
    if mesh is None:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(PIPE_AXIS, 1)


def stack_layer_params(bert_params, num_layers: int):
    """``{'layer0': tree, ...}`` -> one tree whose leaves carry a leading
    (num_layers,) stack axis.  Pure jnp.stack — inside jit it is a single
    HBM copy that GSPMD shards over 'pipe' at the constraint below."""
    layers = [bert_params[f"layer{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def is_stacked_text(text_params) -> bool:
    """True when a text_model param/moment tree carries the RESIDENT
    stacked-layer layout (a 'layers' node instead of layer0..layerN-1).
    Purely structural, so it also works on jit tracers."""
    try:
        return "layers" in text_params["bert"]
    except (TypeError, KeyError):
        return False


def _is_text_tree(node) -> bool:
    """Structural marker for a text_model-shaped tree: the param tree and
    every AdamW moment tree share the {'bert':…, 'classifier':…} top
    level (models/bert.py TextBert / train/optim.py adamw_hf mu/nu)."""
    return isinstance(node, dict) and set(node.keys()) == {"bert", "classifier"}


def stack_text_tree(text_tree, num_layers: int):
    """Plain {'layer0':…, 'layerN-1':…} text tree -> resident stacked
    layout: the per-layer subtrees merge into ONE 'layers' node whose
    leaves carry a leading (num_layers,) axis (shardable over 'pipe').
    Works on params and on AdamW moment trees (identical structure)."""
    if is_stacked_text(text_tree):
        return text_tree
    b = dict(text_tree["bert"])
    layers = [b.pop(f"layer{i}") for i in range(num_layers)]
    b["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {**text_tree, "bert": b}


def unstack_text_tree(text_tree, num_layers: int):
    """Inverse of :func:`stack_text_tree` — back to the plain layout the
    checkpoints/.bin exporters use."""
    if not is_stacked_text(text_tree):
        return text_tree
    b = dict(text_tree["bert"])
    stacked = b.pop("layers")
    for i in range(num_layers):
        b[f"layer{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return {**text_tree, "bert": b}


def map_text_trees(tree, f):
    """Apply ``f`` to every text_model-shaped subtree inside ``tree``
    (optimizer states nest the mu/nu moment trees at arbitrary depth —
    adamw_hf state, or freeze()'s multi_transform wrapper around it);
    all other nodes (step counts, image/critic trees) pass through."""
    return jax.tree.map(lambda n: f(n) if _is_text_tree(n) else n, tree,
                        is_leaf=_is_text_tree)


def stack_resident_text_state(state, num_layers: int):
    """MITrainState -> the pp RESIDENT layout: text params and the text
    optimizer's moment trees carry stacked layers, so `shard_mi_state`
    can rest them 1/S per chip over 'pipe' and the step skips the
    per-step stacking copy.  Checkpoint writers call
    :func:`unstack_resident_text_state` first, so the on-disk layout
    never changes."""
    f = lambda t: stack_text_tree(t, num_layers)
    params = dict(state.params)
    params["text_model"] = f(params["text_model"])
    return state._replace(params=params,
                          txt_opt=map_text_trees(state.txt_opt, f))


def unstack_resident_text_state(state, num_layers: int):
    """Inverse of :func:`stack_resident_text_state` (checkpoint layout)."""
    f = lambda t: unstack_text_tree(t, num_layers)
    params = dict(state.params)
    params["text_model"] = f(params["text_model"])
    return state._replace(params=params,
                          txt_opt=map_text_trees(state.txt_opt, f))


def pp_resident_shardings(mesh, tree):
    """PartitionSpec tree for a resident-stacked text params/moment tree:
    leaves under a 'layers' node shard their leading (num_layers,) stack
    axis over 'pipe'; everything else (embeddings, pooler, classifier,
    scalar counts) replicates."""
    def spec_for(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        if "layers" in names and getattr(leaf, "ndim", 0) >= 1:
            return P(PIPE_AXIS)
        return P()
    return jax.tree_util.tree_map_with_path(spec_for, tree)


def pipelined_encoder(bert_cfg: BertConfig, mesh, stacked_params, hidden,
                      attn_bias, num_microbatches: int, *,
                      deterministic: bool = True,
                      dropout_rng: Optional[jax.Array] = None,
                      dtype: Any = jnp.float32):
    """Run the stacked BERT encoder layers as an S-stage pipeline.

    ``hidden``: (B, L, H) embeddings; ``attn_bias``: (B, 1, 1, L) additive
    mask.  Returns the (B, L, H) final hidden states, replicated over
    'pipe' (batch sharding over 'data', if present, is preserved)."""
    S = pipeline_stage_count(mesh)
    n_layers = bert_cfg.num_hidden_layers
    if n_layers % S:
        raise ValueError(f"num_hidden_layers={n_layers} not divisible by "
                         f"pipeline stages={S}")
    B = hidden.shape[0]
    M = int(num_microbatches)
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    layers_per_stage = n_layers // S
    mb = B // M
    inputs = hidden.reshape((M, mb) + hidden.shape[1:])
    biases = attn_bias.reshape((M, mb) + attn_bias.shape[1:])
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)  # unused when deterministic

    data_ax = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    layer = BertLayer(bert_cfg, dtype=dtype)

    def apply_layer(lp, h, bias, key):
        if deterministic:
            return layer.apply({"params": lp}, h, bias, True)
        return layer.apply({"params": lp}, h, bias, False,
                           rngs={"dropout": key})

    if bert_cfg.remat:
        apply_layer = jax.checkpoint(apply_layer)

    def per_stage(local_params, inputs, biases, rng):
        stage = jax.lax.axis_index(PIPE_AXIS)
        T = M + S - 1

        def block(h, bias, m):
            def layer_step(h, xs):
                lp, idx = xs
                key = jax.random.fold_in(
                    jax.random.fold_in(rng, stage * layers_per_stage + idx), m)
                return apply_layer(lp, h, bias, key), None
            h, _ = jax.lax.scan(layer_step, h,
                                (local_params, jnp.arange(layers_per_stage)))
            return h

        def tick(carry, t):
            state, outputs = carry
            # stage s processes microbatch m = t - s (clipped; out-of-range
            # ticks are pipeline bubbles whose results are never read)
            m = jnp.clip(t - stage, 0, M - 1)
            x0 = jax.lax.dynamic_index_in_dim(inputs, jnp.clip(t, 0, M - 1),
                                              0, keepdims=False)
            x = jnp.where(stage == 0, x0, state)
            bias = jax.lax.dynamic_index_in_dim(biases, m, 0, keepdims=False)
            y = block(x, bias, m)
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outputs, out_idx, 0,
                                                keepdims=False)
            valid = jnp.logical_and(stage == S - 1, t >= S - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, y, prev), out_idx, 0)
            state = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (state, outputs), None

        # the loop body produces pipe-VARYING values (each stage computes
        # its own); the zero-initialized carry must be marked varying too
        # or shard_map's replication checker rejects the scan
        def varying(x):
            return jax.lax.pcast(x, (PIPE_AXIS,), to="varying")
        carry = (varying(jnp.zeros_like(inputs[0])),
                 varying(jnp.zeros_like(inputs)))
        (_, outputs), _ = jax.lax.scan(tick, carry, jnp.arange(T))
        # replicate the last stage's outputs to every stage
        outputs = jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, PIPE_AXIS)

    mapped = jax.shard_map(
        per_stage, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(None, data_ax), P(None, data_ax), P()),
        out_specs=P(None, data_ax))
    out = mapped(stacked_params, inputs, biases, dropout_rng)
    return out.reshape((B,) + hidden.shape[1:])


def pipelined_textbert_apply(bert_cfg: BertConfig, text_params, mesh,
                             input_ids, token_type_ids=None,
                             attention_mask=None, *,
                             num_microbatches: int = 0,
                             deterministic: bool = True,
                             dropout_rng: Optional[jax.Array] = None,
                             dtype: Any = jnp.float32):
    """TextBert forward with the encoder stack pipelined over 'pipe'.

    Semantics-identical to ``TextBert.apply`` (models/bert.py) up to
    dropout key derivation: embeddings/pooler/classifier reuse the very
    same flax modules on the same param subtrees; only the 12-layer
    encoder runs through the pipeline schedule.  Returns
    ``(pooled, logits)`` like the reference forward (model.py:68-81)."""
    S = pipeline_stage_count(mesh)
    M = int(num_microbatches) or S
    p = text_params["bert"]
    n_layers = bert_cfg.num_hidden_layers
    # validate before any sharding work so config errors surface eagerly
    if n_layers % S:
        raise ValueError(f"num_hidden_layers={n_layers} not divisible by "
                         f"pipeline stages={S}")
    if input_ids.shape[0] % M:
        raise ValueError(f"batch {input_ids.shape[0]} not divisible by "
                         f"microbatches {M}")
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    h = bert_cfg.hidden_size
    L = input_ids.shape[1]

    word = nn.Embed(bert_cfg.vocab_size, h, dtype=dtype).apply(
        {"params": p["word_embeddings"]}, input_ids)
    pos = nn.Embed(bert_cfg.max_position_embeddings, h, dtype=dtype).apply(
        {"params": p["position_embeddings"]}, jnp.arange(L)[None, :])
    tok = nn.Embed(bert_cfg.type_vocab_size, h, dtype=dtype).apply(
        {"params": p["token_type_embeddings"]}, token_type_ids)
    hidden = nn.LayerNorm(epsilon=bert_cfg.layer_norm_eps, dtype=dtype).apply(
        {"params": p["embeddings_layernorm"]}, word + pos + tok)
    if not deterministic:
        hidden = nn.Dropout(bert_cfg.hidden_dropout_prob).apply(
            {}, hidden, deterministic=False,
            rngs={"dropout": jax.random.fold_in(dropout_rng, 2 * n_layers)})
    attn_bias = (1.0 - attention_mask[:, None, None, :].astype(dtype)) * -10000.0

    if is_stacked_text(text_params):
        # resident stacked layout (stack_resident_text_state): the params
        # already live 'pipe'-sharded — no per-step stacking copy
        stacked = p["layers"]
    else:
        stacked = stack_layer_params(p, n_layers)
    stacked = jax.lax.with_sharding_constraint(
        stacked, NamedSharding(mesh, P(PIPE_AXIS)))
    hidden = pipelined_encoder(bert_cfg, mesh, stacked, hidden, attn_bias, M,
                               deterministic=deterministic,
                               dropout_rng=dropout_rng, dtype=dtype)

    pooled = jnp.tanh(nn.Dense(h, dtype=dtype).apply(
        {"params": p["pooler"]}, hidden[:, 0]))
    pooled = pooled.astype(jnp.promote_types(pooled.dtype, jnp.float32))
    dropped = pooled
    if not deterministic:
        dropped = nn.Dropout(bert_cfg.hidden_dropout_prob).apply(
            {}, pooled, deterministic=False,
            rngs={"dropout": jax.random.fold_in(dropout_rng, 2 * n_layers + 1)})
    logits = nn.Dense(bert_cfg.num_classes).apply(
        {"params": text_params["classifier"]}, dropped)
    return pooled, logits
