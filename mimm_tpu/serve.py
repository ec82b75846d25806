"""Inference / serving path.

The reference has no serving story (SURVEY.md §0: "no serving path");
its inference surface is validate.py's ad-hoc loop.  For production
deployment this module provides an ``InferenceSession`` that loads the
reference-named checkpoints and serves three jitted entry points with
fixed-batch padding (static shapes — one compile per configured batch):

* ``embed_images(images) -> (N, 768)``   — frozen MI image encoder
* ``embed_texts(ids, masks, segments)``  — frozen MI text encoder
* ``embed_reports(texts) -> (N, 768)``   — raw report strings: server-side
  WordPiece featurization (pass ``vocab_dir``) + the text encoder
* ``classify(images) -> (N,)``           — encoder + per-disease Basic_MLP

Padding semantics: inputs are padded up to ``batch_size`` and results
sliced back, so callers can send any N >= 1.

Serving-only numeric knobs (training semantics are untouched — these
exist because inference has no optimizer/trajectory-parity constraint):

* ``compute_dtype="bfloat16"`` — bf16 activations (MXU-native).
* ``weight_dtype="int8"`` — WEIGHT-ONLY post-training quantization:
  every >=2-D kernel (Dense, conv, embedding tables) is stored as
  symmetric per-output-channel int8 + one float32 scale per channel and
  dequantized inside the jitted graph.  Small-batch serving is weight-
  bandwidth-bound (the whole parameter set streams from HBM per
  request), so halving/quartering weight bytes attacks the actual
  bottleneck.  The quantized trees are passed as jit ARGUMENTS (device
  buffers), not closure constants — as constants XLA would constant-fold
  the dequantize at compile time and bake full-width weights back into
  the executable, erasing the bandwidth win.  Quality is proven against
  the f32 session in tests/test_serve.py (embedding cosine similarity,
  classifier probability deltas).

  MEASUREMENT CAVEAT (2026-08-18, tools/bench_serve.py int8 lanes): on
  THIS dev setup every request crosses the axon tunnel (~24 ms round
  trip — the text B=1 lane bottoms out there), so serving is tunnel-
  latency-bound and int8 measured neutral (text) to slightly slower
  (image tower: dequant cost on convs with no bandwidth shortage to
  relieve).  The weight-bandwidth argument applies to co-located
  production serving; measure on the target before enabling.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.models.bert import BertConfig, TextBert
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.models.resnet import ResNet256_6_2_1


def _quantize_weights(tree):
    """Symmetric per-output-channel int8 for every >=2-D float leaf
    (last axis = output features for flax Dense/conv kernels and
    embedding tables); 1-D leaves (biases, LayerNorm/BN params and
    stats) stay float."""
    def q(x):
        x = np.asarray(x)
        if x.ndim >= 2 and np.issubdtype(x.dtype, np.floating):
            s = np.max(np.abs(x), axis=tuple(range(x.ndim - 1)),
                       keepdims=True) / 127.0
            s = np.maximum(s, 1e-12).astype(np.float32)
            return {"q8": np.clip(np.rint(x / s), -127, 127).astype(np.int8),
                    "s8": s}
        return x
    return jax.tree.map(q, tree)


def _is_q(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q8", "s8"}


def _dequantize(tree, dtype):
    """Rebuild the float param tree inside jit: int8 -> dtype, scaled.
    XLA reads the int8 buffer from HBM and fuses the convert+multiply
    into the consumer's operand pipeline."""
    return jax.tree.map(
        lambda l: (l["q8"].astype(dtype) * l["s8"].astype(dtype))
        if _is_q(l) else l, tree, is_leaf=_is_q)


class DynamicBatcher:
    """Cross-request DYNAMIC BATCHING for a batched inference function.

    Concurrent callers ``submit(*arrays)`` row-blocks of any size; a
    single worker thread drains the queue — waiting up to
    ``max_wait_ms`` after the first arrival to let a batch accumulate,
    up to ``batch_size`` rows — concatenates compatible requests
    (identical trailing shapes/dtypes; mismatched ones are deferred to
    the next round, never dropped), runs ONE call of ``fn``, and
    scatters the result rows back to the waiting callers.  N concurrent
    single-row requests cost ~N/batch_size device calls instead of N
    padded ones — the standard production-serving pattern the
    fixed-batch jit entry points want.  Errors in ``fn`` propagate to
    every caller in the failed group.  No reference counterpart
    (SURVEY.md §0: no serving path)."""

    def __init__(self, fn, batch_size: int, max_wait_ms: float = 5.0):
        self.fn = fn
        self.batch_size = int(batch_size)
        self.max_wait = max(0.0, float(max_wait_ms)) / 1e3
        self._q = queue.Queue()
        self._stop = object()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, *arrays) -> np.ndarray:
        """Blocks until this request's result rows are ready."""
        arrays = tuple(np.asarray(a) for a in arrays)
        n = arrays[0].shape[0]
        box = {"event": threading.Event()}
        self._q.put((arrays, n, box))
        box["event"].wait()
        if "error" in box:
            raise box["error"]
        return box["result"]

    def close(self) -> None:
        self._q.put(self._stop)
        self._worker.join(timeout=5)

    @staticmethod
    def _key(arrays):
        return tuple((a.shape[1:], a.dtype) for a in arrays)

    def _run(self) -> None:
        import time as _time
        pending = []
        while True:
            # block for the first request (or drain leftovers first)
            if not pending:
                item = self._q.get()
                if item is self._stop:
                    return
                pending.append(item)
            deadline = _time.monotonic() + self.max_wait
            group, rows = [], 0
            key = self._key(pending[0][0])
            deferred = []
            while pending or _time.monotonic() < deadline:
                if not pending:
                    try:
                        item = self._q.get(
                            timeout=max(0.0, deadline - _time.monotonic()))
                    except queue.Empty:
                        break
                    if item is self._stop:
                        self._flush(group, key)
                        for it in deferred:
                            self._fail(it, RuntimeError("batcher closed"))
                        return
                    pending.append(item)
                    continue
                item = pending.pop(0)
                if self._key(item[0]) != key:
                    deferred.append(item)  # different shape family: next round
                    continue
                group.append(item)
                rows += item[1]
                if rows >= self.batch_size:
                    break
            self._flush(group, key)
            # leftovers (batch filled early) keep their arrival order,
            # ahead of the shape-mismatched deferrals
            pending = pending + deferred

    def _flush(self, group, key) -> None:
        if not group:
            return
        try:
            joined = [np.concatenate([g[0][i] for g in group])
                      for i in range(len(key))]
            out = np.asarray(self.fn(*joined))
            off = 0
            for arrays, n, box in group:
                box["result"] = out[off:off + n]
                off += n
                box["event"].set()
        except Exception as e:  # propagate to every waiting caller
            for item in group:
                self._fail(item, e)

    @staticmethod
    def _fail(item, err) -> None:
        _, _, box = item
        box["error"] = err
        box["event"].set()


class InferenceSession:
    def __init__(self, save_directory: str, batch_size: int = 64,
                 output_channels: int = 1,
                 bert_config: Optional[BertConfig] = None,
                 classifier_layers: Optional[List[int]] = None,
                 disease: Optional[str] = None,
                 classifier_epoch: Optional[int] = None,
                 compute_dtype: str = "float32",
                 weight_dtype: str = "float32",
                 vocab_dir: Optional[str] = None,
                 max_seq_length: int = 320):
        if weight_dtype not in ("float32", "int8"):
            raise ValueError(f"unsupported weight_dtype: {weight_dtype}")
        self.batch_size = batch_size
        self.max_seq_length = max_seq_length
        # raw-text entry point (embed_reports): WordPiece vocab from
        # vocab_dir (the bert_pretrained_dir layout — vocab.txt inside)
        self._tokenizer = None
        if vocab_dir is not None:
            from mimm_tpu.data.tokenizer import NativeWordPieceTokenizer as WordPieceTokenizer
            self._tokenizer = WordPieceTokenizer.from_pretrained(vocab_dir)
        cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self._quant = weight_dtype == "int8"
        self.image_model = ResNet256_6_2_1(output_channels=output_channels,
                                           dtype=cdt)
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
            self.text_model = TextBert(bert_config, dtype=cdt)
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

        # device-resident weights either way: jit arguments are NOT
        # cached like closure constants, so host trees would re-upload on
        # every request
        if self._quant:
            self.image_vars = _quantize_weights(self.image_vars)
            if self.text_model is not None:
                self.text_vars = _quantize_weights(self.text_vars)
        self.image_vars = jax.device_put(self.image_vars)
        if self.text_model is not None:
            self.text_vars = jax.device_put(self.text_vars)

        def deq(v):
            return _dequantize(v, cdt) if self._quant else v

        # weights are jit ARGUMENTS (device buffers), not closure
        # constants: with int8 weights a constant would be constant-folded
        # through the dequantize at compile time (erasing the bandwidth
        # win), and for f32 it avoids baking a second weight copy per
        # entry point
        img_jit = jax.jit(
            lambda v, imgs: self.image_model.apply(
                deq(v), device_normalize(imgs),
                train=False)[1].astype(jnp.float32))
        self._embed_images = lambda imgs: img_jit(self.image_vars, imgs)
        if self.text_model is not None:
            txt_jit = jax.jit(
                lambda v, ids, masks, segs: self.text_model.apply(
                    deq(v), ids, token_type_ids=segs,
                    attention_mask=masks)[0].astype(jnp.float32))
            self._embed_texts = lambda ids, masks, segs: \
                txt_jit(self.text_vars, ids, masks, segs)
        if self.classifier is not None:
            # the MLP head is tiny (< 1 MB) — always full precision
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

    def featurize_reports(self, texts: List[str]):
        """Raw findings/impression strings -> (ids, masks, segments) with
        the training featurization ([CLS] + WordPiece + [SEP],
        truncate/pad to ``max_seq_length`` — data/features.py contract).
        Pure host work, so a batching frontend can run it per request
        thread and funnel only the encoder call."""
        if self._tokenizer is None:
            raise RuntimeError("no tokenizer loaded (pass vocab_dir)")
        L = self.max_seq_length
        cls_id, = self._tokenizer.convert_tokens_to_ids(["[CLS]"])
        sep_id, = self._tokenizer.convert_tokens_to_ids(["[SEP]"])
        ids = np.zeros((len(texts), L), np.int32)
        masks = np.zeros((len(texts), L), np.int32)
        for i, text in enumerate(texts):
            toks = self._tokenizer.tokenize(text)[:L - 2]
            row = [cls_id] + self._tokenizer.convert_tokens_to_ids(toks) + [sep_id]
            ids[i, :len(row)] = row
            masks[i, :len(row)] = 1
        return ids, masks, np.zeros_like(ids)

    def embed_reports(self, texts: List[str]) -> np.ndarray:
        """Raw report strings -> (N, 768): featurize_reports + the frozen
        text encoder."""
        if self.text_model is None:
            raise RuntimeError("no text model loaded (pass bert_config)")
        return self.embed_texts(*self.featurize_reports(texts))

    def classify(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 1) -> (N,) disease probabilities."""
        if self.classifier is None:
            raise RuntimeError("no classifier loaded (pass classifier_layers "
                               "+ disease)")
        return self._run_batched(self._classify, images)
