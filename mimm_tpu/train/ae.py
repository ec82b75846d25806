"""Unimodal autoencoder trainer — the reference's UniModalManager
(main_utils.py:594-703), TPU-native.

Same training semantics: ResNetAE (2 residual blocks, 6 levels, z_dim 192,
bottleneck 768, multi-res skips), MSE reconstruction, single Adam at
``init_lr``, per-epoch checkpoints named ``encoder_<N>.bin`` /
``decoder_<N>.bin`` / ``autoencoder_path_<N>.bin`` plus epoch loss logging
and a final loss plot (main_utils.py:683-703).

TPU-native: one jitted train step (donated state), batch sharded over the
'data' mesh axis, bfloat16 conv compute with float32 params/loss, host
pipeline prefetching to device.  Unlike the reference, the checkpoint tree
carries optimizer state + step for true resume (SURVEY.md §5).
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
from mimm_tpu.models.autoencoder import ResNetAE
from mimm_tpu.ops.image_norm import device_normalize
from mimm_tpu.parallel import mesh as mesh_lib
from mimm_tpu.train.optim import adam_torch

logger = logging.getLogger(__name__)


class AETrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_ae_model(cfg) -> ResNetAE:
    """Reference config: main_utils.py:600-605."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # the reference itself uses output_channels as the AE INPUT channel
    # count (main_utils.py:600, default 1 = grayscale); kept for parity
    return ResNetAE(input_shape=(cfg.img_size, cfg.img_size, cfg.output_channels),
                    n_residual_blocks=2, n_levels=6, z_dim=192,
                    bottleneck_dim=192 * 4, use_multi_res_skips=True, dtype=dtype)


def _ae_tx(cfg):
    """The AE trainer's single Adam (reference main_utils.py:638), with
    the production bf16 moment-storage knob (cfg.adam_moment_dtype)."""
    mom = jnp.bfloat16 \
        if getattr(cfg, "adam_moment_dtype", "float32") == "bfloat16" else None
    return adam_torch(cfg.init_lr, moment_dtype=mom)


def create_ae_state(model: ResNetAE, cfg, rng) -> AETrainState:
    shape = (1, *model.input_shape)
    variables = model.init(rng, jnp.zeros(shape, jnp.float32), train=False)
    tx = _ae_tx(cfg)
    return AETrainState(variables["params"], variables["batch_stats"],
                        tx.init(variables["params"]), jnp.zeros([], jnp.int32))


def make_ae_train_step(model: ResNetAE, tx, chunks: int = 1, mesh=None,
                       zero1: bool = False, fsdp: bool = False):
    """``chunks`` > 1 (cfg.grad_cache_chunks): chunked gradient
    accumulation — the MSE loss decomposes per sample, so a single
    ``lax.scan`` over equal chunks (value_and_grad per chunk, averaged)
    reproduces the full-batch gradient with activation memory O(B/chunks)
    — AE batch size beyond HBM, one pass (the MI trainer needs the
    two-pass GradCache because its loss couples the whole batch).  Each
    chunk has DP-replica BatchNorm semantics (stats from its own chunk;
    running stats are the cross-chunk mean).  Exactness vs an independent
    oracle: tests/test_grad_cache.py.

    ``zero1``/``fsdp`` (cfg.zero1_optimizer_sharding /
    cfg.fsdp_parameter_sharding, with ``mesh``): same ZeRO ladder as the
    MI trainer — moments and/or at-rest params 'data'-sharded
    (parallel/mesh.py shard_ae_state), with output constraints keeping
    the donated loop's layout stable."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as _P
    zero1 = zero1 and mesh is not None and \
        mesh_lib.DATA_AXIS in mesh.axis_names
    fsdp = fsdp and mesh is not None and \
        mesh_lib.DATA_AXIS in mesh.axis_names

    def pin_zero1(tree):
        specs = mesh_lib.zero1_shardings(mesh, tree)
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, _P))
        return jax.lax.with_sharding_constraint(tree, shardings)

    def pin_replicated(tree):
        return jax.lax.with_sharding_constraint(
            tree, NamedSharding(mesh, _P()))
    def loss_fn(params, batch_stats, images):
        # compact-transfer batches arrive as integer crops; the identical
        # f32 cast + max-normalize runs on device, per chunk
        # (ops/image_norm.py)
        images = device_normalize(images)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"])
        return jnp.mean((out - images) ** 2), mutated["batch_stats"]

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: AETrainState, images: jax.Array):
        if chunks > 1 and images.shape[0] % chunks == 0:
            imgs_c = images.reshape((chunks, images.shape[0] // chunks)
                                    + images.shape[1:])

            def body(acc, chunk):
                acc_g, acc_loss = acc
                (loss, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.batch_stats, chunk)
                return (jax.tree.map(jnp.add, acc_g, g), acc_loss + loss), bs

            zero = (jax.tree.map(jnp.zeros_like, state.params),
                    jnp.zeros([], jnp.float32))
            (g_sum, loss_sum), bs_stack = jax.lax.scan(body, zero, imgs_c)
            grads = jax.tree.map(lambda x: x / chunks, g_sum)
            loss = loss_sum / chunks
            new_bs = jax.tree.map(lambda x: jnp.mean(x, axis=0), bs_stack)
        else:
            if chunks > 1:  # trace-time: shapes are static here
                logger.warning(
                    "grad_cache_chunks=%d does not divide AE batch %d — "
                    "single-pass step for this batch shape", chunks,
                    images.shape[0])
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, images)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if zero1:
            new_opt = pin_zero1(new_opt)
        if zero1 or fsdp:
            new_params = (pin_zero1 if fsdp else pin_replicated)(new_params)
        return AETrainState(new_params, new_bs, new_opt, state.step + 1), loss

    return train_step


def train_auto_encoder(cfg, dataset=None, num_epochs: Optional[int] = None,
                       mesh=None, export_torch_bins: bool = True,
                       resume_from: Optional[str] = None) -> AETrainState:
    """Reference UniModalManager.train (main_utils.py:610-703).

    ``resume_from``: path to a native ``ae_epoch<N>.ckpt`` — restores
    params, BatchNorm stats, optimizer state, and step, and continues from
    the next epoch (the resume story the reference lacks, SURVEY.md §5)."""
    from mimm_tpu.data.pipeline import CXRImageDataset, Loader, device_prefetch

    os.makedirs(cfg.save_directory, exist_ok=True)
    writer = MetricWriter(cfg.save_directory, name="ae",
                          log_filename="training_AE.log",
                          tensorboard=getattr(cfg, "tensorboard", False))
    mesh = mesh or mesh_lib.make_mesh(
        dict(cfg.mesh_shape) or None,
        dcn_mesh_shape=dict(getattr(cfg, "dcn_mesh_shape", ())) or None)
    num_epochs = num_epochs or cfg.num_train_epochs

    if dataset is None:
        from mimm_tpu.data import crop_cache
        dataset = CXRImageDataset(cfg.image_dir, cfg.dataset_metadata,
                                  img_size=cfg.img_size,
                                  compact=getattr(cfg, "compact_transfer",
                                                  False),
                                  crop_cache=crop_cache.from_config(cfg))
    # cfg.data_loader_workers is authoritative (reference parity 32);
    # the Loader caps at cpu_count-1 internally.
    loader = Loader(dataset, batch_size=cfg.batch_size, seed=cfg.seed,
                    num_workers=cfg.data_loader_workers,
                    process_count=jax.process_count(),
                    process_index=jax.process_index())
    logger.info("Total number of training images %d", len(dataset))

    model = build_ae_model(cfg)
    start_epoch = 0
    resume_start_batch = 0
    if resume_from is None:
        state = create_ae_state(model, cfg, jax.random.PRNGKey(cfg.seed))
    else:
        # orbax (directory) checkpoints need a structured target to restore
        # optax namedtuple states with their types — build a template; the
        # pickle path preserves types itself, so skip the init cost there
        target = create_ae_state(model, cfg,
                                 jax.random.PRNGKey(cfg.seed))._asdict() \
            if os.path.isdir(resume_from) else None
        state = AETrainState(**ckpt.load_checkpoint(resume_from,
                                                    target=target))
        start_epoch = int(state.step) // max(1, len(loader))
        # mid-epoch (preemption) checkpoints: fast-forward the resumed
        # epoch's deterministic batch stream past the consumed steps
        resume_start_batch = int(state.step) % max(1, len(loader))
        logger.info("Resumed from %s at step %d (epoch %d, batch %d)",
                    resume_from, int(state.step), start_epoch,
                    resume_start_batch)
    zero1 = getattr(cfg, "zero1_optimizer_sharding", False)
    fsdp = getattr(cfg, "fsdp_parameter_sharding", False)
    state = mesh_lib.shard_ae_state(mesh, state, zero1=zero1, fsdp=fsdp)
    tx = _ae_tx(cfg)
    train_step = make_ae_train_step(
        model, tx, chunks=max(1, int(getattr(cfg, "grad_cache_chunks", 1))),
        mesh=mesh, zero1=zero1, fsdp=fsdp)

    training_loss = []
    preempt_sync = jax.process_count() > 1
    from mimm_tpu.profiling import StepProfiler
    profiler = StepProfiler(os.path.join(cfg.save_directory, "profile"),
                            int(getattr(cfg, "profile_steps", 0)))
    for epoch in range(start_epoch, num_epochs):
        start = time.time()
        # Device-side loss accumulation: one host read per epoch instead of
        # a ~25-40 ms tunnel round trip per step (keeps dispatch pipelined).
        step_losses = []
        batches = (b["image"] for b in loader.epoch(
            epoch, start_batch=resume_start_batch
            if epoch == start_epoch else 0))
        for images in device_prefetch(batches, size=cfg.prefetch,
                                      sharding=mesh_lib.batch_sharding(mesh)):
            state, loss = train_step(state, images)
            step_losses.append(loss)
            profiler.step(loss)
            if preempt.should_stop(sync=preempt_sync):
                # SIGTERM (pod eviction/maintenance): save the FULL state
                # tree and stop; resume_from continues mid-epoch
                # (mimm_tpu.preempt).
                profiler.close()
                path = ckpt.save_checkpoint(
                    os.path.join(cfg.save_directory, "ae_preempt.ckpt"),
                    state._asdict(),
                    format=getattr(cfg, "checkpoint_format", "pickle"))
                logger.warning("preemption requested — saved %s at step %d "
                               "and stopping", path, int(state.step))
                writer.write(step=int(state.step), preempted=1)
                writer.close()
                ckpt.wait_for_async_saves()
                return state
        profiler.close(step_losses[-1] if step_losses else None)
        epoch_loss = float(np.sum(jax.device_get(step_losses))) \
            if step_losses else 0.0
        training_loss.append(epoch_loss)

        every = max(1, int(getattr(cfg, "checkpoint_every_epochs", 1)))
        path = None
        if (epoch + 1) % every == 0 or epoch + 1 == num_epochs:
            path = save_ae_checkpoint(cfg.save_directory, state, epoch + 1,
                                      export_torch_bins=export_torch_bins,
                                      ckpt_format=getattr(
                                          cfg, "checkpoint_format", "pickle"))
            keep = int(getattr(cfg, "keep_checkpoints", 0))
            if keep > 0 and jax.process_index() == 0:
                if getattr(cfg, "checkpoint_format",
                           "pickle") == "orbax_async":
                    ckpt.wait_for_async_saves()  # never prune in-flight
                ckpt.prune_checkpoints(cfg.save_directory, "ae_epoch", keep)
        writer.epoch_summary(epoch + 1, epoch_loss, time.time() - start, path)
        if loader.skipped:
            writer.write(epoch=epoch + 1, skipped_records=loader.skipped)

    Plot_Training("Epochs", "Value for Loss", "Training stats AutoEncoder",
                  [training_loss], ["Training loss"],
                  os.path.join(cfg.save_directory, "autoencoder_training_loss.png"))
    writer.close()
    ckpt.wait_for_async_saves()  # commit any orbax_async epoch saves
    return state


def save_ae_checkpoint(save_dir: str, state: AETrainState, epoch: int,
                       export_torch_bins: bool = True,
                       ckpt_format: str = "pickle") -> str:
    """Native resume tree + reference-named .bin exports
    (main_utils.py:683-689)."""
    path = ckpt.save_checkpoint(os.path.join(save_dir, f"ae_epoch{epoch}.ckpt"),
                                state._asdict(), format=ckpt_format)
    if export_torch_bins and jax.process_count() > 1:
        # pod-sharded params are not fully addressable on any single host;
        # export .bins offline from the (orbax) native checkpoint instead
        logger.warning(".bin export skipped on multi-host runs — convert "
                       "from %s offline", path)
        export_torch_bins = False
    if export_torch_bins:
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        sd = ckpt.ae_state_dict_from_variables(variables)
        ckpt.save_state_dict_bin(os.path.join(save_dir, f"autoencoder_path_{epoch}.bin"), sd)
        enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
        dec = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
        ckpt.save_state_dict_bin(os.path.join(save_dir, f"encoder_{epoch}.bin"), enc)
        ckpt.save_state_dict_bin(os.path.join(save_dir, f"decoder_{epoch}.bin"), dec)
    return path
