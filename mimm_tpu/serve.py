"""Inference / serving path.

The reference has no serving story (SURVEY.md §0: "no serving path");
its inference surface is validate.py's ad-hoc loop.  For production
deployment this module provides an ``InferenceSession`` that loads the
reference-named checkpoints and serves three jitted entry points with
fixed-batch padding (static shapes — one compile per configured batch):

* ``embed_images(images) -> (N, 768)``   — frozen MI image encoder
* ``embed_texts(ids, masks, segments)``  — frozen MI text encoder
* ``classify(images) -> (N,)``           — encoder + per-disease Basic_MLP

Padding semantics: inputs are padded up to ``batch_size`` and results
sliced back, so callers can send any N >= 1.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.models.bert import BertConfig, TextBert
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.models.resnet import ResNet256_6_2_1


class InferenceSession:
    def __init__(self, save_directory: str, batch_size: int = 64,
                 output_channels: int = 1,
                 bert_config: Optional[BertConfig] = None,
                 classifier_layers: Optional[List[int]] = None,
                 disease: Optional[str] = None,
                 classifier_epoch: Optional[int] = None):
        self.batch_size = batch_size
        self.image_model = ResNet256_6_2_1(output_channels=output_channels)
        self.image_vars = ckpt.load_resnet_from_bin(
            os.path.join(save_directory, "pytorch_MI_image_model.bin"))

        self.text_model = None
        txt_path = os.path.join(save_directory, "pytorch_MI_text_model.bin")
        if bert_config is not None:
            if not os.path.exists(txt_path):
                # fail at init like the image model does — a silent skip
                # would surface later as a misleading "pass bert_config"
                raise FileNotFoundError(
                    f"bert_config given but no text checkpoint at {txt_path}")
            self.text_model = TextBert(bert_config)
            sd = ckpt.load_state_dict_bin(txt_path)
            self.text_vars = ckpt.bert_variables_from_state_dict(
                sd, bert_config.num_hidden_layers)

        self.classifier = None
        if classifier_layers is not None and disease is not None:
            from mimm_tpu.validate import find_classifier_checkpoint
            self.classifier = BasicMLP(768, classifier_layers)
            clf_path = find_classifier_checkpoint(save_directory, disease,
                                                  classifier_epoch)
            self.clf_params = ckpt.mlp_params_from_state_dict(
                ckpt.load_state_dict_bin(clf_path))

        from mimm_tpu.ops.image_norm import device_normalize
        self._embed_images = jax.jit(
            lambda imgs: self.image_model.apply(self.image_vars,
                                                device_normalize(imgs),
                                                train=False)[1])
        if self.text_model is not None:
            self._embed_texts = jax.jit(
                lambda ids, masks, segs: self.text_model.apply(
                    self.text_vars, ids, token_type_ids=segs,
                    attention_mask=masks)[0])
        if self.classifier is not None:
            # classify = MLP head over _embed_images: calling the already-
            # jitted embed keeps ONE copy of the image weights as jit
            # constants instead of baking a second copy into this closure
            head = jax.jit(
                lambda emb: self.classifier.apply(self.clf_params, emb)[:, 0])
            self._classify = lambda imgs: head(self._embed_images(imgs))

    def _pad(self, x: np.ndarray):
        n = x.shape[0]
        pad = (-n) % self.batch_size
        if pad:
            x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
        return x, n

    def _run_batched(self, fn, *arrays):
        padded = []
        n = arrays[0].shape[0]
        for a in arrays:
            p, _ = self._pad(np.asarray(a))
            padded.append(p)
        outs = []
        for i in range(0, padded[0].shape[0], self.batch_size):
            chunk = [p[i:i + self.batch_size] for p in padded]
            outs.append(np.asarray(fn(*[jnp.asarray(c) for c in chunk])))
        return np.concatenate(outs)[:n]

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 1) float32 -> (N, 768) embeddings."""
        return self._run_batched(self._embed_images, images)

    def embed_texts(self, ids, masks, segments) -> np.ndarray:
        if self.text_model is None:
            raise RuntimeError("no text model loaded (pass bert_config)")
        return self._run_batched(self._embed_texts, ids, masks, segments)

    def classify(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 1) -> (N,) disease probabilities."""
        if self.classifier is None:
            raise RuntimeError("no classifier loaded (pass classifier_layers "
                               "+ disease)")
        return self._run_batched(self._classify, images)
