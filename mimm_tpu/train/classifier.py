"""Downstream per-disease classifier trainer — the reference's
ClassifierModelManager (main_utils.py:271-591), TPU-native.

Semantics preserved:
* frozen pretrained encoder -> 768-d embedding: multimodal path takes the
  ResNet 5-tuple slot 1, unimodal path takes ResNetAE.encode
  (main_utils.py:376-380);
* Basic_MLP (ReLU+Dropout(0.2), sigmoid head) + BCE loss;
* Adam(init_lr) or SGD(wd=1e-8, momentum=9e-4, nesterov) with
  ExponentialLR(gamma=0.9) stepped per epoch (main_utils.py:341-346);
* 95/5 train/val split (deterministic here; reference random_split
  main_utils.py:303-306);
* per-epoch train/val accuracy + tp/tn/fp/fn tallies, best-val-accuracy
  checkpointing to ``pytorch_image_classifier_<label>_epoch<N>.bin``,
  loss/accuracy plots every 20 epochs and at the end.

TPU-native: the encoder runs under jit in eval mode and, because only the
classifier params are differentiated, the backward pass never touches it —
the reference wastes a full encoder backward per step because its "frozen"
encoder is merely optimizer-less (SURVEY.md §3.3 note).  tp/fp definitions
follow the standard convention (the reference swaps fp/fn at
main_utils.py:504-505 — intent, not the bug; its fp_count counts
pred=0 & label=1).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mimm_tpu import checkpoint as ckpt
from mimm_tpu import preempt
from mimm_tpu.metrics import MetricWriter, Plot_Training
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.ops.image_norm import device_normalize
from mimm_tpu.train.optim import (adam_torch, exponential_epoch_schedule,
                                  sgd_torch)

logger = logging.getLogger(__name__)


class ClassifierTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_embedding_fn(kind: str, model, variables, mesh=None) -> Callable:
    """Jitted frozen-encoder embedding: kind 'multimodal' (ResNet z) or
    'unimodal' (ResNetAE.encode).

    ``mesh``: data-parallel the frozen-encoder pass (the classifier
    phase's dominant cost — the reference runs it for 100 epochs per
    disease): encoder weights replicate over the mesh and each batch
    shards over 'data', so embedding throughput scales with the chip
    count.  Ragged batches (the val loader keeps its remainder) fall
    back to replicated placement — same math either way."""
    if mesh is not None:
        from mimm_tpu.parallel import mesh as mesh_lib
        variables = mesh_lib.replicate(mesh, variables)
    if kind == "multimodal":
        @jax.jit
        def embed(images):
            outs = model.apply(variables, device_normalize(images),
                               train=False)
            return outs[1]
    elif kind == "unimodal":
        from mimm_tpu.models.autoencoder import ResNetAE

        @jax.jit
        def embed(images):
            return model.apply(variables, device_normalize(images),
                               train=False, method=ResNetAE.encode)
    else:
        raise ValueError(f"unknown encoder kind: {kind}")
    if mesh is None:
        return embed

    from mimm_tpu.parallel import mesh as mesh_lib
    d = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        mesh_lib.DATA_AXIS, 1)

    def sharded_embed(images):
        sh = mesh_lib.batch_sharding(mesh) if images.shape[0] % d == 0 \
            else mesh_lib.replicated(mesh)
        return embed(jax.device_put(images, sh))

    return sharded_embed


def make_classifier_step(mlp: BasicMLP, tx, seed: int,
                         rng_impl: str = "threefry2x32"):
    @partial(jax.jit, donate_argnums=0)
    def train_step(state: ClassifierTrainState, emb, labels):
        rng = jax.random.fold_in(jax.random.key(seed, impl=rng_impl),
                                 state.step)

        def loss_fn(params):
            p = mlp.apply(params, emb, train=True, dropout_rng=rng)[:, 0]
            p = jnp.clip(p, 1e-7, 1 - 1e-7)
            return -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log1p(-p))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return ClassifierTrainState(optax.apply_updates(state.params, updates),
                                    new_opt, state.step + 1), loss

    return train_step


def make_predict(mlp: BasicMLP):
    """Jitted (params, emb) -> sigmoid outputs.  params is an ARGUMENT,
    not a closure constant: a per-call closure would re-trace and
    re-compile with the weights baked in on every evaluation."""
    return jax.jit(lambda params, emb: mlp.apply(params, emb)[:, 0])


def evaluate(mlp: BasicMLP, params, embed, loader, epoch: int,
             predict=None, cached_batches=None):
    """Accuracy + confusion tallies over a loader epoch (eval transform).

    ``cached_batches``: optional list of (embedding, label) pairs — e.g.
    the embeddings the train loop just computed (the loader is
    deterministic per (seed, epoch), so they are bitwise identical to a
    fresh pass) — skipping a full frozen-encoder re-run."""
    if predict is None:
        predict = make_predict(mlp)

    def batches():
        if cached_batches is not None:
            for emb, y in cached_batches:
                yield emb, y
            return
        for batch in loader.epoch(epoch):
            yield embed(batch["image"]), batch["label"]

    count = total = tp = tn = fp = fn = pos = neg = 0
    losses = []
    for emb, y in batches():
        p = np.asarray(predict(params, emb))
        y = np.asarray(y)
        pred = np.round(p)
        pc = np.clip(p, 1e-7, 1 - 1e-7)
        losses.append(float(-np.mean(y * np.log(pc) + (1 - y) * np.log1p(-pc))))
        count += int((pred == y).sum())
        total += len(y)
        pos += int((y == 1).sum())
        neg += int((y == 0).sum())
        tp += int(np.logical_and(pred == 1, y == 1).sum())
        tn += int(np.logical_and(pred == 0, y == 0).sum())
        fp += int(np.logical_and(pred == 1, y == 0).sum())
        fn += int(np.logical_and(pred == 0, y == 1).sum())
    acc = count / max(1, total)
    return acc, (float(np.mean(losses)) if losses else 0.0), dict(
        total=total, positive=pos, negative=neg, tp=tp, tn=tn, fp=fp, fn=fn)


class ClassifierModelManager:
    """Reference-shaped facade (main_utils.py:276-316)."""

    def __init__(self, cfg, embed_fn: Callable, mlp_hidden_layers,
                 dataset=None, val_fraction: float = 0.05, mesh=None):
        """``mesh``: data-parallel placement for the tiny MLP state (the
        embed_fn handles its own batch sharding — build it with the SAME
        mesh via ``make_embedding_fn(..., mesh=mesh)``)."""
        from mimm_tpu.data.pipeline import CXRImageDiseaseDataset, Loader

        self.cfg = cfg
        self.embed = embed_fn
        self.mesh = mesh
        self.mlp = BasicMLP(768, list(mlp_hidden_layers))

        if dataset is None:
            from mimm_tpu.data import crop_cache
            dataset = CXRImageDiseaseDataset(
                img_dir=cfg.image_dir, dataset_metadata=cfg.dataset_metadata,
                disease=cfg.disease_label, disease_stats=cfg.dataset_disease_stats,
                img_size=cfg.img_size,
                compact=getattr(cfg, "compact_transfer", False),
                crop_cache=crop_cache.from_config(cfg))
        n = len(dataset)
        order = np.random.default_rng(cfg.seed).permutation(n)
        n_val = max(1, int(round(n * val_fraction)))
        self.train_view = _Subset(dataset, order[n_val:])
        self.val_view = _Subset(dataset, order[:n_val])
        self.train_loader = Loader(self.train_view, cfg.batch_size, seed=cfg.seed)
        self.val_loader = Loader(self.val_view, cfg.batch_size, seed=cfg.seed,
                                 train=False, drop_last=False)

    def train(self, num_epochs: Optional[int] = None,
              export_torch_bins: bool = True,
              resume_from: Optional[str] = None):
        """``resume_from``: path to a ``classifier_<label>_preempt.ckpt``
        (written when a SIGTERM lands mid-run — mimm_tpu.preempt) —
        restores the MLP + optimizer state and the best-accuracy
        bookkeeping (sidecar ``.json``) and continues mid-epoch."""
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_train_epochs_classifier
        os.makedirs(cfg.save_directory, exist_ok=True)
        writer = MetricWriter(
            cfg.save_directory, name=f"classifier_{cfg.disease_label}",
            log_filename=f"training_classifier_{cfg.disease_label}.log",
            tensorboard=getattr(cfg, "tensorboard", False))

        steps_per_epoch = max(1, len(self.train_loader))
        sched = exponential_epoch_schedule(cfg.init_lr, 0.9, steps_per_epoch)
        tx = adam_torch(sched) if cfg.optimizer == "Adam" else sgd_torch(sched)
        params = self.mlp.init(jax.random.PRNGKey(cfg.seed))
        state = ClassifierTrainState(params, tx.init(params),
                                     jnp.zeros([], jnp.int32))
        step_fn = make_classifier_step(self.mlp, tx, cfg.seed,
                                       rng_impl=getattr(cfg, "rng_impl",
                                                        "threefry2x32"))

        predict = make_predict(self.mlp)  # compiled ONCE for all epochs
        tr_losses, tr_accs, va_losses, va_accs = [], [], [], []
        max_accuracy = 0.0
        best_path = None
        start_epoch = 0
        resume_start_batch = 0
        if resume_from is not None:
            import json
            target = state._asdict() if os.path.isdir(resume_from) else None
            state = ClassifierTrainState(**ckpt.load_checkpoint(
                resume_from, target=target))
            aux_path = resume_from.rstrip("/") + ".json"
            if os.path.exists(aux_path):
                aux = json.load(open(aux_path))
                max_accuracy = aux.get("max_accuracy", 0.0)
                best_path = aux.get("best_path")
                tr_losses = aux.get("tr_losses", [])
                tr_accs = aux.get("tr_accs", [])
                va_losses = aux.get("va_losses", [])
                va_accs = aux.get("va_accs", [])
            start_epoch = int(state.step) // steps_per_epoch
            resume_start_batch = int(state.step) % steps_per_epoch
            logger.info("Resumed classifier from %s at step %d (epoch %d, "
                        "batch %d)", resume_from, int(state.step),
                        start_epoch, resume_start_batch)
        if self.mesh is not None:
            from mimm_tpu.parallel import mesh as mesh_lib
            state = mesh_lib.replicate(self.mesh, state)
        preempt_sync = jax.process_count() > 1
        for epoch in range(start_epoch, num_epochs):
            start = time.time()
            start_batch = resume_start_batch if epoch == start_epoch else 0
            step_losses = []
            epoch_embs = []  # reused for train accuracy: the loader is
            # deterministic per (seed, epoch), so a fresh evaluate pass
            # would recompute these exact frozen-encoder embeddings
            preempted = False
            for batch in self.train_loader.epoch(epoch,
                                                 start_batch=start_batch):
                emb = self.embed(batch["image"])
                epoch_embs.append((emb, batch["label"]))
                state, loss = step_fn(state, emb, jnp.asarray(batch["label"]))
                step_losses.append(loss)  # device scalar; read once per epoch
                if preempt.should_stop(sync=preempt_sync):
                    preempted = True
                    break
            if preempted:
                # SIGTERM (pod eviction): save the MLP+optimizer tree plus
                # the best-accuracy bookkeeping and stop; resume_from this
                # checkpoint continues mid-epoch (mimm_tpu.preempt)
                import json
                path = ckpt.save_checkpoint(
                    os.path.join(cfg.save_directory,
                                 f"classifier_{cfg.disease_label}_preempt.ckpt"),
                    state._asdict(),
                    format=getattr(cfg, "checkpoint_format", "pickle"))
                if jax.process_index() == 0:
                    with open(path.rstrip("/") + ".json", "w") as f:
                        json.dump({"max_accuracy": max_accuracy,
                                   "best_path": best_path,
                                   "tr_losses": tr_losses, "tr_accs": tr_accs,
                                   "va_losses": va_losses, "va_accs": va_accs},
                                  f)
                logger.warning("preemption requested — saved %s at step %d "
                               "and stopping", path, int(state.step))
                writer.write(step=int(state.step), preempted=1)
                writer.close()
                ckpt.wait_for_async_saves()
                return state, max_accuracy, best_path
            tr_loss = float(np.mean(jax.device_get(step_losses))) \
                if step_losses else 0.0

            # a mid-epoch-resumed epoch only embedded the REMAINING batches;
            # train accuracy then needs a fresh full pass instead of the cache
            tr_acc, _, _ = evaluate(self.mlp, state.params, self.embed,
                                    self.train_loader, epoch, predict=predict,
                                    cached_batches=epoch_embs
                                    if start_batch == 0 else None)
            va_acc, va_loss, tallies = evaluate(self.mlp, state.params,
                                                self.embed, self.val_loader,
                                                epoch, predict=predict)
            tr_losses.append(tr_loss); tr_accs.append(tr_acc)
            va_losses.append(va_loss); va_accs.append(va_acc)

            if va_acc > max_accuracy:
                max_accuracy = va_acc
                best_path = self.save(state, f"{cfg.disease_label}_epoch{epoch + 1}",
                                      export_torch_bins)
            dt = time.time() - start
            writer.logger.info(
                f"Label: {cfg.disease_label},  Epoch {epoch + 1} took {dt:.3f} s, "
                f"training loss = {tr_loss:.5f}, validation_loss = {va_loss:.5f}, "
                f"validation accuracy={va_acc:.5f}")
            writer.logger.info(
                f"  Total validation samples = {tallies['total']}, "
                f"total positive={tallies['positive']}, total negative={tallies['negative']} "
                f",tp_count={tallies['tp']}, tn_count={tallies['tn']}, "
                f"fp_count={tallies['fp']}, fn_count={tallies['fn']}")
            writer.write(epoch=epoch + 1, train_loss=tr_loss, train_acc=tr_acc,
                         val_loss=va_loss, val_acc=va_acc, **tallies)

            if (epoch + 1) % 20 == 0:
                self._plots(tr_losses, va_losses, tr_accs, va_accs,
                            suffix=f"_epoch{epoch + 1}")

        self._plots(tr_losses, va_losses, tr_accs, va_accs, suffix="")
        writer.close()
        ckpt.wait_for_async_saves()  # commit any orbax_async epoch saves
        return state, max_accuracy, best_path

    def save(self, state: ClassifierTrainState, label: str,
             export_torch_bins: bool = True) -> str:
        cfg = self.cfg
        path = ckpt.save_checkpoint(
            os.path.join(cfg.save_directory, f"classifier_{label}.ckpt"),
            state._asdict(),
            format=getattr(cfg, "checkpoint_format", "pickle"))
        if export_torch_bins and jax.process_count() > 1:
            # pod-sharded params are not fully addressable on one host
            logger.warning(".bin export skipped on multi-host runs — "
                           "convert from %s offline", path)
            export_torch_bins = False
        if export_torch_bins:
            sd = ckpt.mlp_state_dict_from_params(jax.device_get(state.params))
            ckpt.save_state_dict_bin(
                os.path.join(cfg.save_directory,
                             f"pytorch_image_classifier_{label}.bin"), sd)
        return path

    def _plots(self, tr_l, va_l, tr_a, va_a, suffix: str):
        cfg = self.cfg
        d = cfg.disease_label
        Plot_Training("Epochs", "Value for Loss",
                      f"Training stats for disease {d}", [tr_l, va_l],
                      ["Training loss", "Validation loss"],
                      os.path.join(cfg.save_directory,
                                   f"image_classifier_training_loss_{d}{suffix}.png"))
        Plot_Training("Epochs", "Value for Accuracy",
                      f"Training stats for disease {d}", [tr_a, va_a],
                      ["training accuracy", "validation accuracy"],
                      os.path.join(cfg.save_directory,
                                   f"image_classifier_training_accuracy_{d}{suffix}.png"))


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def load(self, idx, rng, train=True):
        return self.dataset.load(int(self.indices[idx]), rng, train=train)
