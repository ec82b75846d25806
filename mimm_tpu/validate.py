"""Validation: held-out accuracy + GDV separability.

Reference parity (validate.py:63-153): load the MI image model and a
classifier checkpoint, run the test-set disease dataset, compute
accuracy = mean(round(sigmoid) == label), collect positive/negative
embeddings, and compute the generalised discrimination value
(metrics.gdv_calculation).  Unlike the reference, the classifier
checkpoint path is derived from the requested disease (the reference
hardcodes 'pytorch_image_classifier_Pneumonia_epoch7.bin' regardless —
validate.py:95; intent, not the bug).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import List, Optional

import jax
import numpy as np

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.metrics import binary_classification_report, gdv_calculation
from mimm_tpu.ops.image_norm import device_normalize
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.models.resnet import ResNet256_6_2_1

logger = logging.getLogger(__name__)


def find_classifier_checkpoint(save_directory: str, disease: str,
                               epoch: Optional[int] = None) -> str:
    if epoch is not None:
        return os.path.join(save_directory,
                            f"pytorch_image_classifier_{disease}_epoch{epoch}.bin")
    candidates = sorted(
        glob.glob(os.path.join(save_directory,
                               f"pytorch_image_classifier_{disease}_epoch*.bin")),
        key=lambda p: int(p.rsplit("epoch", 1)[1].split(".")[0]))
    if not candidates:
        raise FileNotFoundError(
            f"no classifier checkpoint for {disease} in {save_directory}")
    return candidates[-1]


def _make_loader(cfg, disease: str, dataset=None):
    from mimm_tpu.data.pipeline import CXRImageDiseaseDataset, Loader

    if dataset is None:
        from mimm_tpu.data import crop_cache
        dataset = CXRImageDiseaseDataset(
            img_dir=cfg.image_dir, dataset_metadata=cfg.dataset_metadata,
            disease=disease, disease_stats=cfg.dataset_disease_stats,
            img_size=cfg.img_size,
            compact=getattr(cfg, "compact_transfer", False),
            crop_cache=crop_cache.from_config(cfg))
    return Loader(dataset, batch_size=cfg.batch_size, seed=cfg.seed,
                  train=False, drop_last=False)


def _load_classifier(cfg, mlp_layer: List[int], disease: str,
                     classifier_epoch: Optional[int], embedding_dim: int):
    clf = BasicMLP(embedding_dim, mlp_layer)
    clf_path = find_classifier_checkpoint(cfg.save_directory, disease,
                                          classifier_epoch)
    clf_params = ckpt.mlp_params_from_state_dict(ckpt.load_state_dict_bin(clf_path))
    logger.info("Loaded classifier from %s", clf_path)
    return clf, clf_params


def _image_putter(mesh):
    """Data-parallel the frozen-encoder validation pass: batches shard
    over the mesh's 'data' axis (the drop_last=False loader's ragged
    final batch falls back to replicated placement — same math).  The
    weight trees are numpy closure constants, so GSPMD replicates them
    on its own.  mesh=None: identity (single-device)."""
    if mesh is None:
        return lambda x: x
    from mimm_tpu.parallel import mesh as mesh_lib
    d = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        mesh_lib.DATA_AXIS, 1)

    def put(images):
        sh = mesh_lib.batch_sharding(mesh) if images.shape[0] % d == 0 \
            else mesh_lib.replicated(mesh)
        return jax.device_put(images, sh)

    return put


def _run_validation(forward, loader, put=None) -> dict:
    """Shared test loop (reference validate.py:111-151): accuracy =
    mean(round(sigmoid) == label); GDV over collected pos/neg embeddings.
    Extends the reference with AUC-ROC / precision / recall / F1 and the
    confusion counts (metrics.binary_classification_report)."""
    put = put or (lambda x: x)
    all_probs, all_labels = [], []
    pos_emb, neg_emb = [], []
    for batch in loader.epoch(0):
        emb, probs = forward(put(batch["image"]))
        emb = np.asarray(emb)
        labels = np.asarray(batch["label"])
        all_probs.append(np.asarray(probs))
        all_labels.append(labels)
        pos_emb.extend(emb[labels == 1])
        neg_emb.extend(emb[labels == 0])

    if all_labels:
        report = binary_classification_report(np.concatenate(all_labels),
                                              np.concatenate(all_probs))
    else:
        report = binary_classification_report(np.zeros(0), np.zeros(0))
    report["separability"] = gdv_calculation(pos_emb, neg_emb) \
        if pos_emb and neg_emb else float("nan")
    logger.info("Accuracy: %s  Separability: %s", report["accuracy"],
                report["separability"])
    logger.info("AUC: %s  Precision: %s  Recall: %s  F1: %s  "
                "(tp=%d tn=%d fp=%d fn=%d)", report["auc"],
                report["precision"], report["recall"], report["f1"],
                report["tp"], report["tn"], report["fp"], report["fn"])
    return report


def validate_MultiModal(cfg, mlp_layer: List[int], disease: str,
                        dataset=None, classifier_epoch: Optional[int] = None,
                        extended: bool = False, mesh=None):
    """Returns (accuracy, separability) like reference validate.py:63-153;
    with ``extended=True`` the full report dict (accuracy, auc, precision,
    recall, f1, confusion counts, separability) instead.  ``mesh``:
    data-parallel the encoder pass (see :func:`_image_putter`)."""
    loader = _make_loader(cfg, disease, dataset)

    image_model = ResNet256_6_2_1(output_channels=cfg.output_channels)
    img_vars = ckpt.load_resnet_from_bin(
        os.path.join(cfg.save_directory, "pytorch_MI_image_model.bin"))
    # the 768-d embedding z is fc1's INPUT (resnet.py: z -> Dense fc1 logits)
    emb_dim = int(np.asarray(img_vars["params"]["fc1"]["kernel"]).shape[0])
    clf, clf_params = _load_classifier(cfg, mlp_layer, disease,
                                       classifier_epoch, emb_dim)

    @jax.jit
    def forward(images):
        outs = image_model.apply(img_vars, device_normalize(images),
                                 train=False)
        emb = outs[1]
        return emb, clf.apply(clf_params, emb)[:, 0]

    report = _run_validation(forward, loader, put=_image_putter(mesh))
    return report if extended else (report["accuracy"],
                                    report["separability"])


def find_ae_checkpoint(save_directory: str, epoch: Optional[int] = None) -> str:
    """Latest (or requested-epoch) ``autoencoder_path_<N>.bin`` — the UM
    chain's pretrained encoder (reference train.py:98-111)."""
    if epoch is not None:
        return os.path.join(save_directory, f"autoencoder_path_{epoch}.bin")
    candidates = sorted(
        glob.glob(os.path.join(save_directory, "autoencoder_path_*.bin")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    if not candidates:
        raise FileNotFoundError(f"no autoencoder checkpoint in {save_directory}")
    return candidates[-1]


def validate_UniModal(cfg, mlp_layer: List[int], disease: str,
                      dataset=None, classifier_epoch: Optional[int] = None,
                      ae_epoch: Optional[int] = None,
                      extended: bool = False, mesh=None):
    """Unimodal counterpart (reference validate.py's um_*.log runs,
    save_dir/validation/um_*.log): embeddings come from the pretrained
    ResNetAE bottleneck (``ResNetAE.encode``, autoencoder_model.py:206-208)
    loaded from ``autoencoder_path_<N>.bin``, then the same accuracy + GDV
    pass — completing the headline MM-vs-UM comparison end to end."""
    from mimm_tpu.models.autoencoder import ResNetAE
    from mimm_tpu.train.ae import build_ae_model

    loader = _make_loader(cfg, disease, dataset)

    ae = build_ae_model(cfg)
    ae_path = find_ae_checkpoint(cfg.save_directory, ae_epoch)
    ae_vars = ckpt.ae_variables_from_state_dict(ckpt.load_state_dict_bin(ae_path))
    logger.info("Loaded autoencoder from %s", ae_path)
    emb_dim = int(np.asarray(ae_vars["params"]["fc1"]["kernel"]).shape[-1])
    clf, clf_params = _load_classifier(cfg, mlp_layer, disease,
                                       classifier_epoch, emb_dim)

    @jax.jit
    def forward(images):
        emb = ae.apply(ae_vars, device_normalize(images), train=False,
                       method=ResNetAE.encode)
        return emb, clf.apply(clf_params, emb)[:, 0]

    report = _run_validation(forward, loader, put=_image_putter(mesh))
    return report if extended else (report["accuracy"],
                                    report["separability"])
