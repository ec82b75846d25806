"""Text featurization: TSV examples -> fixed-length token features.

Reference parity (model_utils.py:341-544): reads ``all_data.tsv`` (5-col:
index, label, study_id, img_path, findings-text), WordPiece-tokenizes with
[CLS]/[SEP], truncates to ``max_seq_length``, zero-pads ids/mask/segments,
maps labels "0"-"3" (+ "-1" for unlabeled), and caches features on disk
keyed by sequence length (``cachedfeatures_train_seqlen-<L>``).

TPU-native difference: the cache is a single .npz of dense int32 arrays
(ids/mask/segments stacked) instead of a pickled object list — it loads
with one mmap-able read and feeds straight into device batching without
per-example tensor conversion.
"""

from __future__ import annotations

import csv
import logging
import os
from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np

logger = logging.getLogger(__name__)

LABEL_LIST = ["0", "1", "2", "3"]  # reference get_labels (model_utils.py:455-457)


def convert_to_onehot(severity: int) -> List[int]:
    """Pulmonary-edema severity (0-3) -> one-hot (reference
    model_utils.py:29-39)."""
    if severity not in (0, 1, 2, 3):
        raise ValueError("No other possibilities of ordinal labels are possible")
    out = [0, 0, 0, 0]
    out[severity] = 1
    return out


@dataclass
class InputExample:
    """One report (reference model_utils.py:384-403)."""
    report_id: str
    guid: str
    text_a: str
    text_b: str = None
    labels: str = None


@dataclass
class InputFeatures:
    """Tokenized report (reference model_utils.py:373-381)."""
    input_ids: List[int]
    input_mask: List[int]
    segment_ids: List[int]
    label_id: int
    report_id: str


def read_tsv(path: str) -> List[List[str]]:
    with open(path, encoding="utf-8") as f:
        return [line for line in csv.reader(f, delimiter="\t")]


def create_examples_from_tsv(path: str, set_type: str = "dev") -> List[InputExample]:
    """Reference ClassificationDataProcessor._create_examples
    (model_utils.py:459-471): text = last col, label = col 1, report_id =
    col 2 (the study id)."""
    examples = []
    for i, line in enumerate(read_tsv(path)):
        examples.append(InputExample(
            report_id=line[2], guid=f"{set_type}-{i}", text_a=line[-1],
            labels=line[1]))
    return examples


def convert_example_to_feature(example: InputExample, label_map: Dict[str, int],
                               max_seq_length: int, tokenizer) -> InputFeatures:
    """Reference convert_example_to_feature (model_utils.py:474-528).

    Tokenizers exposing ``encode_wordpiece_ids`` (our WordPieceTokenizer
    facade, incl. the C++-backed NativeWordPieceTokenizer) take the
    one-call ids path — identical output, skips the token-string
    round-trip; arbitrary tokenizers (e.g. transformers') keep the
    reference's tokenize + convert_tokens_to_ids flow."""
    if hasattr(tokenizer, "encode_wordpiece_ids"):
        ids_a = tokenizer.encode_wordpiece_ids(example.text_a)
        ids_a = ids_a[: max_seq_length - 2]
        cls_id, sep_id = tokenizer.convert_tokens_to_ids(["[CLS]", "[SEP]"])
        input_ids = [cls_id] + ids_a + [sep_id]
    else:
        tokens_a = tokenizer.tokenize(example.text_a)
        if len(tokens_a) > max_seq_length - 2:
            tokens_a = tokens_a[: max_seq_length - 2]
        input_ids = tokenizer.convert_tokens_to_ids(
            ["[CLS]"] + tokens_a + ["[SEP]"])
    segment_ids = [0] * len(input_ids)
    input_mask = [1] * len(input_ids)
    pad = [0] * (max_seq_length - len(input_ids))
    return InputFeatures(input_ids=input_ids + pad, input_mask=input_mask + pad,
                         segment_ids=segment_ids + pad,
                         label_id=label_map[example.labels],
                         report_id=example.report_id)


_POOL_STATE: Dict = {}


def _pool_init(label_map, max_seq_length, tokenizer):
    _POOL_STATE.update(label_map=label_map, max_seq_length=max_seq_length,
                       tokenizer=tokenizer)


def _pool_convert(example: InputExample) -> InputFeatures:
    return convert_example_to_feature(example, _POOL_STATE["label_map"],
                                      _POOL_STATE["max_seq_length"],
                                      _POOL_STATE["tokenizer"])


def _jax_backend_live() -> bool:
    """True once a jax backend has been created in this process — forking
    after that point can deadlock the device client, so the tokenization
    pool falls back to serial.  FAIL CLOSED: if jax is importable but the
    backend registry can't be read (private-API drift), assume a backend
    is live and stay serial — the wrong answer here is a deadlock, not a
    slowdown."""
    import sys
    if "jax" not in sys.modules:
        return False  # jax never imported -> no backend can exist
    try:
        from jax._src import xla_bridge
        backends = getattr(xla_bridge, "_backends", None)
        if backends is None:  # registry moved/renamed: can't tell
            return True
        return bool(backends)
    except Exception:
        return True


def convert_examples_to_features(examples: Sequence[InputExample],
                                 max_seq_length: int, tokenizer,
                                 num_workers: int = 0
                                 ) -> List[InputFeatures]:
    """Tokenize ``examples``; with ``num_workers`` > 1 fan out over a
    process pool like the reference (model_utils.py:539-543,
    ``Pool(cpu_count()-1)``) — pure-python WordPiece is GIL-bound, so
    threads cannot help.  ``Pool.map`` preserves order, so the feature
    list is identical to the serial one.  Serial fallbacks: few examples,
    one core, or a live jax backend (fork hazard).

    A NativeWordPieceTokenizer (C++ encoder, releases the GIL) fans out
    over THREADS instead — same parallelism without the fork hazard, so
    it stays parallel even after jax initializes."""
    label_map = {label: i for i, label in enumerate(LABEL_LIST)}
    label_map["-1"] = -1  # unlabeled (model_utils.py:536)
    workers = min(int(num_workers), max(1, (os.cpu_count() or 1) - 1))
    if (workers > 1 and len(examples) >= 4 * workers
            and getattr(tokenizer, "native_gil_free", False)):
        from concurrent.futures import ThreadPoolExecutor
        # NOTE: ThreadPoolExecutor.map ignores chunksize (it only applies to
        # ProcessPoolExecutor), so chunk manually — per-item dispatch through
        # the executor queue costs more than the native encode itself.
        chunk = max(16, len(examples) // (8 * workers))
        chunks = [examples[i:i + chunk] for i in range(0, len(examples), chunk)]
        with ThreadPoolExecutor(workers) as pool:
            out = []
            for part in pool.map(
                    lambda es: [convert_example_to_feature(
                        e, label_map, max_seq_length, tokenizer) for e in es],
                    chunks):
                out.extend(part)
            return out
    if workers > 1 and len(examples) >= 4 * workers and not _jax_backend_live():
        from multiprocessing import get_context
        with get_context("fork").Pool(
                workers, initializer=_pool_init,
                initargs=(label_map, max_seq_length, tokenizer)) as pool:
            chunk = max(16, len(examples) // (8 * workers))
            return pool.map(_pool_convert, examples, chunksize=chunk)
    return [convert_example_to_feature(e, label_map, max_seq_length, tokenizer)
            for e in examples]


class TokenFeatureSet:
    """Dense, keyed token features: the TPU-friendly replacement for the
    reference's {report_id: list} dicts (model_utils.py:111-113)."""

    def __init__(self, report_ids: np.ndarray, input_ids: np.ndarray,
                 input_mask: np.ndarray, segment_ids: np.ndarray,
                 label_ids: np.ndarray):
        self.report_ids = report_ids            # (N,) str array
        self.input_ids = input_ids.astype(np.int32)    # (N, L)
        self.input_mask = input_mask.astype(np.int32)  # (N, L)
        self.segment_ids = segment_ids.astype(np.int32)
        self.label_ids = label_ids.astype(np.int32)
        self.index = {str(r): i for i, r in enumerate(report_ids)}

    def __len__(self):
        return len(self.report_ids)

    def lookup(self, report_id: str):
        i = self.index.get(str(report_id))
        if i is None:
            return None
        return self.input_ids[i], self.input_mask[i], self.segment_ids[i]

    @classmethod
    def from_features(cls, features: Sequence[InputFeatures]) -> "TokenFeatureSet":
        return cls(
            report_ids=np.array([f.report_id for f in features]),
            input_ids=np.array([f.input_ids for f in features]),
            input_mask=np.array([f.input_mask for f in features]),
            segment_ids=np.array([f.segment_ids for f in features]),
            label_ids=np.array([f.label_id for f in features]),
        )

    def save(self, path: str) -> None:
        np.savez_compressed(path, report_ids=self.report_ids,
                            input_ids=self.input_ids, input_mask=self.input_mask,
                            segment_ids=self.segment_ids, label_ids=self.label_ids)

    @classmethod
    def load(cls, path: str) -> "TokenFeatureSet":
        z = np.load(path, allow_pickle=False)
        return cls(z["report_ids"], z["input_ids"], z["input_mask"],
                   z["segment_ids"], z["label_ids"])


def load_and_cache_examples(text_data_dir: str, max_seq_length: int, tokenizer,
                            tsv_name: str = "all_data.tsv",
                            num_workers: int = 0) -> TokenFeatureSet:
    """Reference load_and_cache_examples (model_utils.py:341-370) with an
    .npz cache (``cachedfeatures_train_seqlen-<L>.npz``).  The cache is
    written atomically (temp + rename) so concurrent multi-host runs can
    race on it safely."""
    cache = os.path.join(text_data_dir,
                         f"cachedfeatures_train_seqlen-{max_seq_length}.npz")
    if os.path.exists(cache):
        logger.info("Loading features from cached file %s", cache)
        return TokenFeatureSet.load(cache)
    logger.info("Creating features from dataset file at %s", text_data_dir)
    examples = create_examples_from_tsv(os.path.join(text_data_dir, tsv_name))
    features = convert_examples_to_features(examples, max_seq_length, tokenizer,
                                            num_workers=num_workers)
    fs = TokenFeatureSet.from_features(features)
    tmp = f"{cache}.tmp.{os.getpid()}.npz"  # np.savez appends .npz otherwise
    fs.save(tmp)
    os.replace(tmp, cache)
    return fs
