"""Multimodal mutual-information trainer — the reference's MultiModalManager
(main_utils.py:53-268), TPU-native.

Training semantics preserved:
* joint ResNet+BERT forward -> 768-d embeddings (model.py:540-555);
* MI discriminator make_mlp(1536, [1024, 512]) scoring (img, txt) pairs;
* DV or InfoNCE bound over positives (diagonal) and study-id-masked
  negatives — computed as a fused (B, B) score matrix with *identical*
  loss values to the reference's O(B^2) pair loop (objectives/);
* three optimizers: Adam(init_lr) on the image tower, Adam(init_lr) on the
  discriminator, pytorch_transformers-AdamW(2e-5, correct_bias=False,
  wd 0.1 except bias/LayerNorm) + warmup-linear on the text tower
  (main_utils.py:151-172);
* per-epoch checkpoints with the reference naming contracts
  (pytorch_MI_image_model.bin, pytorch_MI_text_model.bin,
  pytorch_model_epoch<N>.bin) + epoch loss/time log lines + loss plot.

TPU-native:
* ONE jitted train step (donated state) containing forward, pairing,
  bound, backward, and all three optimizer updates — the reference's
  ~4k-kernel-launch pair loop becomes a few fused XLA ops;
* batch sharded over the 'data' mesh axis; under pjit the (B, B) score
  matrix spans the GLOBAL batch, so cross-chip negatives come from an
  XLA all-gather over ICI automatically (cfg.global_negatives);
* bfloat16 encoder compute, float32 loss/optimizer state;
* deterministic dropout keyed on (seed, step).

Configuration: run with ``TrainingConfig.production()`` (CLI
``--preset production``) for the benched production configuration —
bench.py measures exactly that preset — or ``TrainingConfig.parity()``
for exact reference numerics (config.py is the single source of truth).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mimm_tpu import checkpoint as ckpt
from mimm_tpu import preempt
from mimm_tpu.metrics import MetricWriter, Plot_Training
from mimm_tpu.models.bert import BertConfig
from mimm_tpu.models.joint import ImageReportModel
from mimm_tpu.models.mlp import make_mlp
from mimm_tpu.objectives import critics as critics_lib
from mimm_tpu.objectives.pairing import pairwise_critic_scores
from mimm_tpu.ops.image_norm import decompact_batch
from mimm_tpu.parallel import mesh as mesh_lib
from mimm_tpu.train.optim import (adam_torch, adamw_hf, bert_decay_mask,
                                  bert_trainable_mask, freeze,
                                  resnet_trainable_mask,
                                  warmup_linear_schedule)

logger = logging.getLogger(__name__)

CRITIC_HIDDEN = (1024, 512)  # reference main_utils.py:77


class MITrainState(NamedTuple):
    params: Any          # joint model params: {'image_model':…, 'text_model':…}
    batch_stats: Any
    critic_params: Any
    img_opt: Any
    mi_opt: Any
    txt_opt: Any
    step: jax.Array


class MIOptimizers(NamedTuple):
    img: optax.GradientTransformation
    mi: optax.GradientTransformation
    txt: optax.GradientTransformation


def load_bert_config(cfg) -> BertConfig:
    path = os.path.join(cfg.bert_pretrained_dir, cfg.bert_config_name)
    overrides = dict(num_classes=cfg.output_channels,
                     flash_attention=getattr(cfg, "flash_attention", True),
                     gelu_tanh=getattr(cfg, "gelu_tanh", False),
                     u8_dropout=getattr(cfg, "u8_dropout", False),
                     fused_ffn=getattr(cfg, "fused_ffn", False))
    if os.path.exists(path):
        return BertConfig.from_json_file(path, **overrides)
    logger.warning("No bert config at %s — using bert-base defaults", path)
    return BertConfig(**overrides)


def build_joint_model(cfg, bert_config: Optional[BertConfig] = None,
                      mesh=None) -> ImageReportModel:
    """``mesh``: pass the training mesh to activate cfg.sequence_parallel
    (needs a 'model' axis; seq_sharding returns None otherwise).  The
    module is an execution schedule only — params/checkpoints are
    identical with or without SP."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    sp = mesh_lib.seq_sharding(mesh) \
        if mesh is not None and getattr(cfg, "sequence_parallel", False) else None
    return ImageReportModel(bert_config=bert_config or load_bert_config(cfg),
                            output_channels=cfg.output_channels, dtype=dtype,
                            s2d_stem=getattr(cfg, "s2d_stem", False),
                            pallas_stem=getattr(cfg, "pallas_stem", False),
                            sp_sharding=sp)


def make_optimizers(cfg, steps_per_epoch: int,
                    num_epochs: Optional[int] = None) -> MIOptimizers:
    """``num_epochs``: the epoch count the run will ACTUALLY train for
    (Manager.train's override); defaults to cfg.num_train_epochs.  The
    warmup-linear schedule's t_total must match the real run length or a
    short run sits entirely inside warmup."""
    total = int((num_epochs or cfg.num_train_epochs) * steps_per_epoch)
    sched = warmup_linear_schedule(cfg.bert_lr,
                                   warmup_steps=cfg.warmup_fraction * total,
                                   t_total=total)
    adam_mom = jnp.bfloat16 \
        if getattr(cfg, "adam_moment_dtype", "float32") == "bfloat16" else None
    img = adam_torch(cfg.init_lr, moment_dtype=adam_mom)
    moment_dtype = jnp.bfloat16 \
        if getattr(cfg, "adamw_moment_dtype", "float32") == "bfloat16" else None
    txt = adamw_hf(sched, eps=1e-6, weight_decay=0.1, correct_bias=False,
                   mask=bert_decay_mask, moment_dtype=moment_dtype)
    # Reference fine-tuning freezes (model.py:83-89,490-495), optax-style:
    if getattr(cfg, "freeze_image_encoder", False):
        img = freeze(img, resnet_trainable_mask)
    if getattr(cfg, "freeze_text_encoder", False):
        txt = freeze(txt, bert_trainable_mask)
    return MIOptimizers(img=img, mi=adam_torch(cfg.init_lr,
                                               moment_dtype=adam_mom),
                        txt=txt)


def create_mi_state(model: ImageReportModel, cfg, txs: MIOptimizers, rng,
                    bert_variables: Optional[dict] = None) -> MITrainState:
    k_model, k_critic = jax.random.split(rng)
    # 1 image channel: CXR JPEGs are grayscale and the pipeline always
    # yields (B, H, W, 1); the reference hardcodes conv1 in_channels=1
    # (model.py:299).  cfg.output_channels is the CLASSIFIER head width.
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, 1))
    ids = jnp.zeros((1, cfg.max_seq_length), jnp.int32)
    variables = model.init(k_model, img, ids)
    params = variables["params"]
    if bert_variables is not None:  # pretrained BERT ingestion (C13)
        merged = dict(params["text_model"])
        for k, v in bert_variables["params"].items():
            merged[k] = v
        params = {**params, "text_model": merged}
    # critic input = img embedding + text embedding dims, read from the
    # model's actual output shapes (768 + 768 = 1536 in the reference
    # configuration, main_utils.py:77)
    emb_img_shape, emb_txt_shape = jax.eval_shape(
        lambda v: model.apply(v, img, ids)[:2], {"params": params,
                                                 "batch_stats": variables.get("batch_stats", {})})
    critic_in = emb_img_shape.shape[-1] + emb_txt_shape.shape[-1]
    critic = make_mlp(k_critic, critic_in, list(CRITIC_HIDDEN))
    return MITrainState(
        params=params, batch_stats=variables.get("batch_stats", {}),
        critic_params=critic,
        img_opt=txs.img.init(params["image_model"]),
        mi_opt=txs.mi.init(critic),
        txt_opt=txs.txt.init(params["text_model"]),
        step=jnp.zeros([], jnp.int32))


def make_mi_step_body(model: ImageReportModel, txs: MIOptimizers, cfg,
                      data_shards: int = 1, mesh=None):
    """UNJITTED step body (state, batch) -> (state, loss): forward +
    pair-scores + bound + backward + all three optimizer updates.

    Shared by the jitted single step, the ``lax.scan`` multi-step, and
    tests — one body, no re-derivation from a jit wrapper.

    ``mesh``: pass the training mesh to activate PIPELINE PARALLELISM of
    the text tower when it has a 'pipe' axis (parallel/pipeline.py): the
    encoder stack runs as a GPipe microbatch schedule with
    ``cfg.pipeline_microbatches`` microbatches (0 = one per stage).
    Params/checkpoints are unchanged — pp is an execution schedule.

    Negative sourcing (``cfg.global_negatives``):
    * True (default): one (B, B) score matrix over the whole (global) batch.
      Under pjit with the batch sharded over 'data', XLA inserts the
      cross-chip all-gather itself — negatives span every chip.
    * False with ``data_shards`` > 1: the batch is treated as
      ``data_shards`` contiguous blocks and negatives are drawn only
      within each block (the reference's single-device pairing semantics
      at per-shard batch size); the loss is the mean over blocks.  The
      blocked (n, b, d) layout keeps each block's score matrix on its own
      shard, so NO embedding all-gather is emitted.
    """
    estimator = cfg.mi_estimator
    use_pallas = getattr(cfg, "use_pallas_critic", False)
    local_blocks = 1 if getattr(cfg, "global_negatives", True) \
        else max(1, int(data_shards))
    grad_cache = max(1, int(getattr(cfg, "grad_cache_chunks", 1)))

    def score_fn(critic_params, emb_img, emb_txt):
        if use_pallas:
            from mimm_tpu.ops.pairwise_critic import pairwise_critic_scores_pallas
            return pairwise_critic_scores_pallas(critic_params, emb_img, emb_txt)
        return pairwise_critic_scores(critic_params, emb_img, emb_txt)

    def bound_fn(scores, sids):
        if estimator == "dv":
            return critics_lib.dv_bound_from_scores(scores, sids)
        if estimator == "infonce":
            return critics_lib.infonce_bound_from_scores(scores, sids)
        if estimator == "infonce_per_anchor":
            return critics_lib.infonce_per_anchor(scores, sids)
        raise ValueError(f"unknown mi estimator: {estimator}")

    def loss_from_embeddings(critic_params, emb_img, emb_txt, sids):
        """Embeddings -> bound.  Shared by the direct body and the
        grad-cache body (the pairing/critic/bound stage is identical —
        only how embedding gradients reach the towers differs)."""
        if local_blocks > 1 and emb_img.shape[0] % local_blocks == 0:
            n, b = local_blocks, emb_img.shape[0] // local_blocks
            ei = emb_img.reshape(n, b, emb_img.shape[-1])
            et = emb_txt.reshape(n, b, emb_txt.shape[-1])
            si = sids.reshape(n, b)
            scores = jax.vmap(lambda a, c: score_fn(critic_params, a, c))(ei, et)
            return jnp.mean(jax.vmap(bound_fn)(scores, si))
        if local_blocks > 1:  # trace-time: shapes are static here
            logger.warning(
                "global_negatives=False requested but batch %d is not "
                "divisible by %d data shards — computing GLOBAL "
                "negatives instead (different loss semantics, emits a "
                "cross-chip all-gather)", emb_img.shape[0], local_blocks)
        scores = score_fn(critic_params, emb_img, emb_txt)
        return bound_fn(scores, sids)

    from mimm_tpu.parallel.pipeline import (PIPE_AXIS, is_stacked_text,
                                            pipeline_stage_count,
                                            pp_resident_shardings)
    use_pp = mesh is not None and PIPE_AXIS in mesh.axis_names \
        and pipeline_stage_count(mesh) > 1

    # ZeRO-1 (cfg.zero1_optimizer_sharding): moment trees live 'data'-
    # sharded (parallel/mesh.py zero1_shardings).  The constraints below
    # keep that layout stable through the donated step loop — without
    # them GSPMD is free to emit replicated outputs, which would both
    # undo the memory saving and recompile the step on the next call.
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as _P
    zero1 = getattr(cfg, "zero1_optimizer_sharding", False) \
        and mesh is not None and mesh_lib.DATA_AXIS in mesh.axis_names
    # FSDP/ZeRO-3 (cfg.fsdp_parameter_sharding): params rest 'data'-
    # sharded too; GSPMD all-gathers each tensor at its forward use and
    # computes the update on the shard.
    fsdp = getattr(cfg, "fsdp_parameter_sharding", False) \
        and mesh is not None and mesh_lib.DATA_AXIS in mesh.axis_names
    tp_mesh = mesh is not None and mesh_lib.MODEL_AXIS in mesh.axis_names

    def pin_zero1(tree):
        specs = mesh_lib.zero1_shardings(mesh, tree)
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, _P))
        return jax.lax.with_sharding_constraint(tree, shardings)

    def pin_replicated(tree):
        return jax.lax.with_sharding_constraint(
            tree, NamedSharding(mesh, _P()))

    def pin_pp(tree):
        """Keep the pp RESIDENT text layout (stacked layers 'pipe'-sharded,
        parallel/pipeline.py) stable through the donated step loop."""
        specs = pp_resident_shardings(mesh, tree)
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, _P))
        return jax.lax.with_sharding_constraint(tree, shardings)

    def embed(joint_params, batch_stats, batch, dropout_rng):
        """One tower forward: (compact) batch -> (emb_img, emb_txt), new
        batch_stats.  decompact here so grad-cache chunks never widen more
        than one chunk of images at a time."""
        batch = decompact_batch(batch)
        if use_pp:
            # pipeline-parallel text tower (parallel/pipeline.py): the
            # image tower runs its plain (replicated-over-'pipe') forward;
            # the BERT encoder stack runs the GPipe schedule over 'pipe'.
            from mimm_tpu.models.resnet import ResNet256_6_2_1
            from mimm_tpu.parallel.pipeline import pipelined_textbert_apply
            k_img, k_txt = jax.random.split(dropout_rng)
            img_model = ResNet256_6_2_1(output_channels=model.output_channels,
                                        dtype=model.dtype,
                                        s2d_stem=model.s2d_stem,
                                        pallas_stem=model.pallas_stem)
            outs, mutated = img_model.apply(
                {"params": joint_params["image_model"],
                 "batch_stats": batch_stats.get("image_model", {})},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": k_img})
            emb_img = outs[1]
            emb_txt, _ = pipelined_textbert_apply(
                model.bert_config, joint_params["text_model"], mesh,
                batch["txt_ids"], batch["txt_segments"], batch["txt_masks"],
                num_microbatches=getattr(cfg, "pipeline_microbatches", 0),
                deterministic=False, dropout_rng=k_txt, dtype=model.dtype)
            return (emb_img, emb_txt), {"image_model": mutated["batch_stats"]}
        outputs, mutated = model.apply(
            {"params": joint_params, "batch_stats": batch_stats},
            batch["image"], batch["txt_ids"], batch["txt_masks"],
            batch["txt_segments"], train=True,
            rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
        emb_img, emb_txt, _, _ = outputs
        return (emb_img, emb_txt), mutated["batch_stats"]

    def mi_loss(joint_params, critic_params, batch_stats, batch, dropout_rng):
        (emb_img, emb_txt), new_bs = embed(joint_params, batch_stats, batch,
                                           dropout_rng)
        # study_id passes through decompact_batch untouched (_WIDEN covers
        # only token arrays) — read it straight off the input batch
        loss = loss_from_embeddings(critic_params, emb_img, emb_txt,
                                    batch["study_id"])
        return loss, new_bs

    def finish_step(state: MITrainState, loss, joint_g, critic_g, new_bs):
        """Three-optimizer tail (reference main_utils.py:226-230), shared
        by both bodies."""
        img_u, img_opt = txs.img.update(joint_g["image_model"], state.img_opt,
                                        state.params["image_model"])
        txt_u, txt_opt = txs.txt.update(joint_g["text_model"], state.txt_opt,
                                        state.params["text_model"])
        mi_u, mi_opt = txs.mi.update(critic_g, state.mi_opt, state.critic_params)

        new_params = {
            "image_model": optax.apply_updates(state.params["image_model"], img_u),
            "text_model": optax.apply_updates(state.params["text_model"], txt_u),
        }
        new_critic = optax.apply_updates(state.critic_params, mi_u)
        pp_resident = use_pp and is_stacked_text(state.params["text_model"])
        if pp_resident:
            # resident stacked text layout (parallel/pipeline.py): params
            # and moments rest 'pipe'-sharded; pin them so the donated
            # loop never drifts back to replicated
            new_params["text_model"] = pin_pp(new_params["text_model"])
            txt_opt = pin_pp(txt_opt)
        if zero1:
            img_opt, mi_opt = pin_zero1(img_opt), pin_zero1(mi_opt)
            if not tp_mesh and not pp_resident:
                # under tp/pp-resident, text moments follow their own layout
                txt_opt = pin_zero1(txt_opt)
        if zero1 or fsdp:
            # output params must land back on their at-rest layout
            # (fsdp: 'data'-sharded; plain zero1: replicated) or the
            # donated loop's layout drifts and the step recompiles
            pin_params = pin_zero1 if fsdp else pin_replicated
            new_params["image_model"] = pin_params(new_params["image_model"])
            if not tp_mesh:  # under tp, text/critic keep their TP layouts
                if not pp_resident:
                    new_params["text_model"] = pin_params(new_params["text_model"])
                new_critic = pin_params(new_critic)
        return MITrainState(new_params, new_bs, new_critic, img_opt, mi_opt,
                            txt_opt, state.step + 1), loss

    def step_body(state: MITrainState, batch):
        base_key = jax.random.key(cfg.seed,
                                  impl=getattr(cfg, "rng_impl", "threefry2x32"))
        dropout_rng = jax.random.fold_in(base_key, state.step)
        (loss, new_bs), grads = jax.value_and_grad(mi_loss, argnums=(0, 1),
                                                   has_aux=True)(
            state.params, state.critic_params, state.batch_stats, batch,
            dropout_rng)
        joint_g, critic_g = grads
        return finish_step(state, loss, joint_g, critic_g, new_bs)

    # ---- cfg.grad_allreduce_dtype: explicit shard_map gradient path ----
    # The plain jit step leaves the cross-chip gradient all-reduce to
    # GSPMD, which runs it at the gradient dtype (f32).  For pods that
    # collective dominates (~468 MB/step f32 for bert-base+ResNet+critic);
    # this path computes per-shard gradients under shard_map and performs
    # the all-reduce EXPLICITLY on bf16-cast values — half the bytes, same
    # math up to bf16 rounding of the sum.  BatchNorm runs as explicit
    # sync-BN (bn_axis_name) to reproduce the GSPMD step's implicit
    # global-batch statistics; dropout keys fold in the shard index (mask
    # PLACEMENT differs from the GSPMD step's single global mask — same
    # distribution; equivalence tests run dropout-off).
    gad = getattr(cfg, "grad_allreduce_dtype", "float32")
    data_size = dict(mesh.shape).get(mesh_lib.DATA_AXIS, 1) \
        if mesh is not None else 1
    if gad not in ("float32", ""):
        # Composes with zero1/fsdp: shard_map in_specs=P() all-gathers
        # fsdp-sharded params on entry (that IS the FSDP gather), the bf16
        # psum produces replicated grads, and finish_step re-pins params/
        # moments to their at-rest layouts exactly as on the GSPMD path.
        # Still excluded: tp/pp/SP (text/critic keep their own layouts and
        # must not be gathered), grad-cache (chunked two-pass forward),
        # and local negatives (different loss).
        supported = (gad == "bfloat16" and data_size > 1 and not tp_mesh
                     and not use_pp
                     and grad_cache == 1 and local_blocks == 1
                     and getattr(cfg, "sequence_parallel", False) is False)
        if not supported:
            logger.warning(
                "grad_allreduce_dtype=%s requested but unsupported with "
                "this mesh/knob combination (needs a 'data' mesh without "
                "tp/pp/sp, global negatives, no grad-cache; zero1/fsdp "
                "are fine) — keeping the float32 GSPMD collective", gad)
        else:
            try:
                from jax import shard_map as _sm

                def shard_map(f, **kw):  # new API renamed check_rep
                    kw["check_vma"] = kw.pop("check_rep")
                    return _sm(f, **kw)
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            model_bn = ImageReportModel(
                bert_config=model.bert_config,
                output_channels=model.output_channels, dtype=model.dtype,
                s2d_stem=model.s2d_stem, pallas_stem=model.pallas_stem,
                bn_axis_name=mesh_lib.DATA_AXIS)
            gad_dtype = jnp.bfloat16

            def local_loss(joint_params, critic_params, batch_stats, batch,
                           dropout_rng):
                batch = decompact_batch(batch)
                outputs, mutated = model_bn.apply(
                    {"params": joint_params, "batch_stats": batch_stats},
                    batch["image"], batch["txt_ids"], batch["txt_masks"],
                    batch["txt_segments"], train=True,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
                ei = jax.lax.all_gather(outputs[0], mesh_lib.DATA_AXIS,
                                        axis=0, tiled=True)
                et = jax.lax.all_gather(outputs[1], mesh_lib.DATA_AXIS,
                                        axis=0, tiled=True)
                sids = jax.lax.all_gather(batch["study_id"],
                                          mesh_lib.DATA_AXIS, axis=0,
                                          tiled=True)
                loss = bound_fn(score_fn(critic_params, ei, et), sids)
                return loss, mutated["batch_stats"]

            def grad_shard(joint_params, critic_params, batch_stats, batch,
                           dropout_rng):
                rng = jax.random.fold_in(
                    dropout_rng, jax.lax.axis_index(mesh_lib.DATA_AXIS))
                (loss, new_bs), (jg, cg) = jax.value_and_grad(
                    local_loss, argnums=(0, 1), has_aux=True)(
                    joint_params, critic_params, batch_stats, batch, rng)
                # tower grads: each shard holds its local-batch contribution
                # (the all_gather transposes to a cotangent slice) — THE
                # all-reduce, in bf16
                jg = jax.tree.map(
                    lambda g: jax.lax.psum(g.astype(gad_dtype),
                                           mesh_lib.DATA_AXIS).astype(g.dtype),
                    jg)
                # critic grads: every shard computed the FULL gradient (the
                # whole (B, B) bound is replicated work) — bf16 pmean keeps
                # the collective small and the magnitude right
                cg = jax.tree.map(
                    lambda g: (jax.lax.psum(g.astype(gad_dtype),
                                            mesh_lib.DATA_AXIS)
                               / data_size).astype(g.dtype),
                    cg)
                return loss, new_bs, jg, cg

            from jax.sharding import PartitionSpec as P
            sharded_grads = shard_map(
                grad_shard, mesh=mesh,
                in_specs=(P(), P(), P(), P(mesh_lib.DATA_AXIS), P()),
                out_specs=(P(), P(), P(), P()), check_rep=False)

            def gad_body(state: MITrainState, batch):
                base_key = jax.random.key(
                    cfg.seed, impl=getattr(cfg, "rng_impl", "threefry2x32"))
                dropout_rng = jax.random.fold_in(base_key, state.step)
                loss, new_bs, joint_g, critic_g = sharded_grads(
                    state.params, state.critic_params, state.batch_stats,
                    batch, dropout_rng)
                return finish_step(state, loss, joint_g, critic_g, new_bs)
            return gad_body

    def grad_cache_body(state: MITrainState, batch):
        """GradCache two-pass step (Gao et al. 2021, "Scaling Deep
        Contrastive Learning Batch Size under Memory Limited Setup"):

        1. chunked no-grad forward — embeddings only, activations freed
           per chunk (lax.scan over ``grad_cache_chunks`` chunks);
        2. full-batch pairing + bound on the tiny (B, 768) embedding
           tables; gradients w.r.t. the critic AND the embeddings;
        3. chunked VJP re-forward — each chunk's tower activations are
           rebuilt, the cached embedding cotangents are pulled back to
           parameter space, and gradients accumulate across chunks.

        The (B, B) negative pool spans the FULL batch while tower
        activation memory is O(B / chunks): contrastive batch size is no
        longer bounded by HBM.  Compute cost is one extra tower forward
        (~1.5x a direct step).  Chunk semantics match a data-parallel
        replica (per-chunk BatchNorm statistics and dropout keys; running
        stats are the cross-chunk mean) — the same semantics the
        reference's batch-64 BN has at chunk size 64 (SURVEY.md §7
        "BatchNorm under pjit").  Gradient-exactness vs direct autodiff
        through the identical chunked forward is proven in
        tests/test_grad_cache.py.  No reference counterpart.
        """
        n = grad_cache
        if batch["image"].shape[0] % n:  # trace-time: shapes are static
            logger.warning(
                "grad_cache_chunks=%d does not divide batch %d — falling "
                "back to the direct (single-pass) step for this batch "
                "shape", n, batch["image"].shape[0])
            return step_body(state, batch)
        base_key = jax.random.key(cfg.seed,
                                  impl=getattr(cfg, "rng_impl", "threefry2x32"))
        step_key = jax.random.fold_in(base_key, state.step)
        chunks = jax.tree.map(
            lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:]), batch)
        chunk_keys = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(
            jnp.arange(n))

        # pass 1: embeddings, no differentiation — scan keeps live
        # activations bounded to one chunk
        def p1(_, xs):
            chunk, key = xs
            embs, bs = embed(state.params, state.batch_stats, chunk, key)
            return 0, (embs, bs)
        _, ((emb_img_c, emb_txt_c), bs_stack) = jax.lax.scan(
            p1, 0, (chunks, chunk_keys))
        # running stats: cross-chunk mean of each chunk's update (each
        # chunk saw the SAME input stats, like unsynced DP replicas later
        # averaged)
        new_bs = jax.tree.map(lambda x: jnp.mean(x, axis=0), bs_stack)
        emb_img = emb_img_c.reshape((-1,) + emb_img_c.shape[2:])
        emb_txt = emb_txt_c.reshape((-1,) + emb_txt_c.shape[2:])
        sids = batch["study_id"]  # untouched by decompact_batch

        # pairing + bound on the embedding tables: cheap full-batch pass
        loss, (critic_g, g_ei, g_et) = jax.value_and_grad(
            loss_from_embeddings, argnums=(0, 1, 2))(
            state.critic_params, emb_img, emb_txt, sids)

        # pass 2: pull embedding cotangents back through each chunk's
        # towers; accumulate parameter gradients across chunks
        g_ei_c = g_ei.reshape(emb_img_c.shape).astype(emb_img_c.dtype)
        g_et_c = g_et.reshape(emb_txt_c.shape).astype(emb_txt_c.dtype)
        zero_g = jax.tree.map(jnp.zeros_like, state.params)

        def p2(acc, xs):
            chunk, key, gi, gt = xs
            _, vjp_fn, _ = jax.vjp(
                lambda p: embed(p, state.batch_stats, chunk, key),
                state.params, has_aux=True)
            (pg,) = vjp_fn((gi, gt))
            return jax.tree.map(jnp.add, acc, pg), None
        joint_g, _ = jax.lax.scan(p2, zero_g, (chunks, chunk_keys,
                                               g_ei_c, g_et_c))
        return finish_step(state, loss, joint_g, critic_g, new_bs)

    if grad_cache > 1:
        return grad_cache_body
    return step_body


def make_mi_train_step(model: ImageReportModel, txs: MIOptimizers, cfg,
                       data_shards: int = 1, mesh=None):
    """Jitted (donated-state) single train step; see make_mi_step_body."""
    body = make_mi_step_body(model, txs, cfg, data_shards=data_shards,
                             mesh=mesh)
    return jax.jit(body, donate_argnums=0)


def save_mi_checkpoints(save_dir: str, state: MITrainState, epoch: int,
                        bert_config: BertConfig,
                        export_torch_bins: bool = True,
                        ckpt_format: str = "pickle") -> str:
    """Native tree + reference .bin naming contracts (model.py:557-595).

    Checkpoints ALWAYS use the plain unstacked text layout: a pp-resident
    state (parallel/pipeline.py stack_resident_text_state) is unstacked
    here, so on-disk trees are layout-independent and any mesh/pp config
    can resume from any checkpoint."""
    from mimm_tpu.parallel.pipeline import (is_stacked_text,
                                            unstack_resident_text_state)
    if is_stacked_text(state.params["text_model"]):
        state = unstack_resident_text_state(state,
                                            bert_config.num_hidden_layers)
    os.makedirs(save_dir, exist_ok=True)
    path = ckpt.save_checkpoint(os.path.join(save_dir, f"mi_epoch{epoch}.ckpt"),
                                state._asdict(), format=ckpt_format)
    # reference save_pretrained writes the bert config next to the joint
    # checkpoint (model.py:584); always written — the offline converter
    # multi-host runs rely on reads its layer count from here — but by
    # process 0 only (all processes share save_dir)
    if jax.process_index() == 0:
        bert_config.to_json_file(os.path.join(save_dir, "config.json"))
    if export_torch_bins and jax.process_count() > 1:
        # pod-sharded params are not fully addressable on any single host;
        # export .bins offline from the (orbax) native checkpoint instead
        logger.warning(".bin export skipped on multi-host runs — convert "
                       "from %s offline", path)
        export_torch_bins = False
    if export_torch_bins:
        params = jax.device_get(state.params)
        bstats = jax.device_get(state.batch_stats)
        img_sd = ckpt.resnet_state_dict_from_variables(
            {"params": params["image_model"],
             "batch_stats": bstats.get("image_model", {})})
        ckpt.save_state_dict_bin(os.path.join(save_dir, "pytorch_MI_image_model.bin"),
                                 img_sd)
        txt_sd = ckpt.bert_state_dict_from_variables(
            {"params": params["text_model"]}, bert_config.num_hidden_layers)
        ckpt.save_state_dict_bin(os.path.join(save_dir, "pytorch_MI_text_model.bin"),
                                 txt_sd)
        joint = {f"image_model.{k}": v for k, v in img_sd.items()}
        joint.update({f"text_model.{k}": v for k, v in txt_sd.items()})
        ckpt.save_state_dict_bin(
            os.path.join(save_dir, f"pytorch_model_epoch{epoch}.bin"), joint)
    return path


def make_mi_multi_step(model: ImageReportModel, txs: MIOptimizers, cfg,
                       data_shards: int = 1, mesh=None):
    """K chained train steps in ONE dispatch via lax.scan over a stacked
    super-batch (leading axis num_steps).  Semantically identical to K
    sequential ``make_mi_train_step`` calls (same shared body); amortizes
    per-dispatch overhead (~4 ms through the tunnel — ~9%% of a
    short-bucket step).  Returns (state, losses[num_steps])."""
    body = make_mi_step_body(model, txs, cfg, data_shards=data_shards,
                             mesh=mesh)

    @partial(jax.jit, donate_argnums=0)
    def multi_step(state: MITrainState, batches):
        return jax.lax.scan(body, state, batches)

    return multi_step


class MultiModalManager:
    """Reference-shaped manager facade (main_utils.py:53-78)."""

    def __init__(self, cfg, bert_config: Optional[BertConfig] = None,
                 load_pretrained_bert: bool = True):
        self.cfg = cfg
        self.bert_config = bert_config or load_bert_config(cfg)
        self.model = build_joint_model(cfg, self.bert_config)
        self.bert_variables = None
        if load_pretrained_bert:
            self.bert_variables = ckpt.load_bert_pytorch_bin(
                cfg.bert_pretrained_dir, self.bert_config.num_hidden_layers)
            if self.bert_variables is None:
                logger.warning("No pretrained BERT weights found in %s — "
                               "random init", cfg.bert_pretrained_dir)

    def train(self, token_features, dataset=None, mesh=None,
              num_epochs: Optional[int] = None,
              export_torch_bins: bool = True,
              resume_from: Optional[str] = None,
              stop_after_epoch: Optional[int] = None) -> MITrainState:
        """``resume_from``: path to a native ``mi_epoch<N>.ckpt`` — restores
        the full three-optimizer state + step and continues from the next
        epoch (capability absent in the reference, SURVEY.md §5).

        ``stop_after_epoch``: end the run (with a checkpoint) after this
        many epochs while keeping ``num_epochs`` as the LR schedule's
        t_total — for partial runs that a later ``resume_from`` continues
        on the identical schedule (e.g. the warm-start knob A/Bs,
        tools/fixture_dv_run.py)."""
        from mimm_tpu.data.pipeline import (CXRImageReportDataset, Loader,
                                            device_prefetch, scan_chunks)

        cfg = self.cfg
        os.makedirs(cfg.save_directory, exist_ok=True)
        writer = MetricWriter(cfg.save_directory, name="mi",
                              log_filename="training_MI.log",
                              tensorboard=getattr(cfg, "tensorboard", False))
        mesh = mesh or mesh_lib.make_mesh(
            dict(cfg.mesh_shape) or None,
            dcn_mesh_shape=dict(getattr(cfg, "dcn_mesh_shape", ())) or None)
        num_epochs = num_epochs or cfg.num_train_epochs
        if getattr(cfg, "sequence_parallel", False) and \
                mesh_lib.seq_sharding(mesh) is not None:
            # rebuild with the SP activation constraints bound to this
            # mesh (same params/checkpoints — execution schedule only)
            self.model = build_joint_model(cfg, self.bert_config, mesh=mesh)

        if dataset is None:
            from mimm_tpu.data import crop_cache
            dataset = CXRImageReportDataset(
                token_features, cfg.image_dir, cfg.dataset_metadata,
                img_size=cfg.img_size,
                compact=getattr(cfg, "compact_transfer", False),
                crop_cache=crop_cache.from_config(cfg))
        buckets = list(getattr(cfg, "seq_buckets", ()) or ()) or None
        if buckets and max(buckets) < cfg.max_seq_length:
            # a sample longer than the largest bucket would be SILENTLY
            # truncated to it (pipeline._stack slices to the bucket
            # length) — semantics the bucketing feature promises not to
            # change.  Extend with a max-length bucket instead.
            logger.warning(
                "seq_buckets max %d < max_seq_length %d: adding a %d "
                "bucket so longer reports keep their full tokens",
                max(buckets), cfg.max_seq_length, cfg.max_seq_length)
            buckets.append(cfg.max_seq_length)
        # cfg.data_loader_workers is authoritative (reference
        # DataLoader(num_workers=32) parity, helpers.py:113); the Loader
        # itself caps at cpu_count-1 so small hosts never oversubscribe.
        loader = Loader(dataset, batch_size=cfg.batch_size, seed=cfg.seed,
                        bucket_lengths=buckets,
                        num_workers=cfg.data_loader_workers,
                        # multi-host (after mesh.initialize_distributed):
                        # each process decodes its slice of the global batch
                        process_count=jax.process_count(),
                        process_index=jax.process_index())
        logger.info("Total number of training image-report pairs: %d", len(dataset))

        # True batches/epoch: under bucketing each bucket drops its own
        # remainder, so len(loader) would overcount — skewing both the
        # warmup schedule's t_total and resume epoch derivation.
        steps_per_epoch = max(1, loader.batches_per_epoch())
        txs = make_optimizers(cfg, steps_per_epoch=steps_per_epoch,
                              num_epochs=num_epochs)
        start_epoch = 0
        resume_start_batch = 0
        if resume_from is None:
            state = create_mi_state(self.model, cfg, txs,
                                    jax.random.PRNGKey(cfg.seed),
                                    bert_variables=self.bert_variables)
        else:
            # orbax (directory) checkpoints need a structured target to
            # restore optax namedtuple states with their types — build a
            # template; the pickle path preserves types itself, so skip
            # the full model-init cost there
            target = create_mi_state(
                self.model, cfg, txs, jax.random.PRNGKey(cfg.seed),
                bert_variables=self.bert_variables)._asdict() \
                if os.path.isdir(resume_from) else None
            state = MITrainState(**ckpt.load_checkpoint(resume_from,
                                                        target=target))
            start_epoch = int(state.step) // steps_per_epoch
            # mid-epoch (preemption) checkpoints: fast-forward the resumed
            # epoch's deterministic batch stream past the consumed steps
            resume_start_batch = int(state.step) % steps_per_epoch
            logger.info("Resumed from %s at step %d (epoch %d, batch %d)",
                        resume_from, int(state.step), start_epoch,
                        resume_start_batch)
        from mimm_tpu.parallel.pipeline import (pipeline_stage_count,
                                                stack_resident_text_state)
        if pipeline_stage_count(mesh) > 1:
            # pp RESIDENT layout: text params + AdamW moments restack onto
            # a 'pipe'-shardable (num_layers,) axis — 1/S per chip at
            # rest, no per-step stacking copy.  Checkpoints stay plain
            # (save_mi_checkpoints unstacks), so resume works both ways.
            state = stack_resident_text_state(
                state, self.bert_config.num_hidden_layers)
        # replicate (pure DP) or, with a 'model' mesh axis, tensor-parallel
        # critic + Megatron-style BERT placement; zero1 = moments sharded
        # over 'data' (parallel/mesh.py)
        state = mesh_lib.shard_mi_state(
            mesh, state,
            zero1=getattr(cfg, "zero1_optimizer_sharding", False),
            fsdp=getattr(cfg, "fsdp_parameter_sharding", False))
        data_shards = 1 if cfg.global_negatives else \
            int(dict(mesh.shape).get(mesh_lib.DATA_AXIS, 1))
        train_step = make_mi_train_step(self.model, txs, cfg,
                                        data_shards=data_shards, mesh=mesh)
        scan_steps = max(1, int(getattr(cfg, "scan_steps", 1)))
        multi_step = make_mi_multi_step(self.model, txs, cfg,
                                        data_shards=data_shards, mesh=mesh) \
            if scan_steps > 1 else None

        def batch_shard(b):
            return (mesh_lib.stacked_batch_sharding(mesh)
                    if b["image"].ndim == 5 else mesh_lib.batch_sharding(mesh))

        training_loss = []
        preempt_sync = jax.process_count() > 1
        from mimm_tpu.profiling import StepProfiler
        profiler = StepProfiler(os.path.join(cfg.save_directory, "profile"),
                                int(getattr(cfg, "profile_steps", 0)))
        for epoch in range(start_epoch, num_epochs):
            start = time.time()
            # Accumulate step losses as device scalars and read them ONCE at
            # epoch end: a per-step float(loss) would force a device->host
            # round trip (~25-40 ms through the axon tunnel) that serializes
            # the otherwise fully pipelined dispatch chain.
            step_losses = []
            stream = loader.epoch(
                epoch, start_batch=resume_start_batch
                if epoch == start_epoch else 0)
            if scan_steps > 1:
                stream = scan_chunks(stream, scan_steps)
            for batch in device_prefetch(stream, size=cfg.prefetch,
                                         sharding=batch_shard):
                if batch["image"].ndim == 5:  # stacked scan chunk
                    state, losses = multi_step(state, batch)
                    step_losses.append(losses)
                else:
                    state, loss = train_step(state, batch)
                    step_losses.append(loss)
                profiler.step(step_losses[-1])
                if preempt.should_stop(sync=preempt_sync):
                    # SIGTERM (pod eviction/maintenance): save the FULL
                    # state tree and stop.  resume_from this path picks
                    # the run back up mid-epoch (mimm_tpu.preempt).
                    # Preempt checkpoints use the plain text layout too
                    # (resume restacks when the new run is pp).
                    profiler.close()
                    from mimm_tpu.parallel.pipeline import (
                        is_stacked_text, unstack_resident_text_state)
                    save_state = state
                    if is_stacked_text(state.params["text_model"]):
                        save_state = unstack_resident_text_state(
                            state, self.bert_config.num_hidden_layers)
                    path = ckpt.save_checkpoint(
                        os.path.join(cfg.save_directory, "mi_preempt.ckpt"),
                        save_state._asdict(),
                        format=getattr(cfg, "checkpoint_format", "pickle"))
                    logger.warning(
                        "preemption requested — saved %s at step %d and "
                        "stopping", path, int(state.step))
                    writer.write(step=int(state.step), preempted=1)
                    writer.close()
                    ckpt.wait_for_async_saves()
                    return state
            profiler.close(step_losses[-1] if step_losses else None)
            epoch_loss = float(sum(np.sum(x) for x in
                                   jax.device_get(step_losses))) \
                if step_losses else 0.0
            training_loss.append(epoch_loss)

            every = max(1, int(getattr(cfg, "checkpoint_every_epochs", 1)))
            stopping = stop_after_epoch is not None \
                and epoch + 1 >= stop_after_epoch
            path = None
            if (epoch + 1) % every == 0 or epoch + 1 == num_epochs or stopping:
                path = save_mi_checkpoints(cfg.save_directory, state, epoch + 1,
                                           self.bert_config,
                                           export_torch_bins=export_torch_bins,
                                           ckpt_format=getattr(
                                               cfg, "checkpoint_format",
                                               "pickle"))
                keep = int(getattr(cfg, "keep_checkpoints", 0))
                if keep > 0 and jax.process_index() == 0:
                    if getattr(cfg, "checkpoint_format",
                               "pickle") == "orbax_async":
                        ckpt.wait_for_async_saves()  # never prune in-flight
                    ckpt.prune_checkpoints(cfg.save_directory, "mi_epoch",
                                           keep)
            writer.epoch_summary(epoch + 1, epoch_loss, time.time() - start, path)
            if loader.skipped:
                writer.write(epoch=epoch + 1, skipped_records=loader.skipped)
            if stopping:
                logger.info("stop_after_epoch=%d reached (schedule t_total "
                            "stays %d epochs) — checkpointed and stopping",
                            stop_after_epoch, num_epochs)
                break

        Plot_Training("Epochs", "Value for Loss", "MI training",
                      [training_loss], ["train loss"],
                      os.path.join(cfg.save_directory,
                                   "mutual_information_training.png"))
        writer.close()
        ckpt.wait_for_async_saves()  # commit any orbax_async epoch saves
        return state
