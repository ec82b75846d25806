"""Native (C++) WordPiece encoder parity vs the pure-Python tokenizer.

The native encoder (native/mimm_host.cpp mimm_wp_encode) implements the
exact BERT basic+wordpiece algorithm for ASCII text and must refuse
(Python fallback) on anything non-ASCII.  Parity oracle: the pure-Python
WordPieceTokenizer, itself parity-tested against transformers'
BertTokenizer in test_data.py — so native == python == HuggingFace.
"""

import glob
import os

import pytest

from mimm_tpu.data import native_ops
from mimm_tpu.data.tokenizer import (NativeWordPieceTokenizer,
                                     WordPieceTokenizer)

REF_TEXT = "/root/reference/full_data_set/text"

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "lungs", "are", "clear", "no", "acute", "cardio",
         "##pulmonary", "process", "heart", "size", "is", "normal",
         "pleural", "effusion", ",", ".", "-", "un", "##change", "##d",
         "a", "##b", "##c", "ab", "x"]

ADVERSARIAL = [
    "",
    " ",
    "\t\n\r ",
    "the lungs are clear.  no acute cardiopulmonary process.",
    "HEART SIZE IS NORMAL, UNCHANGED - NO PLEURAL EFFUSION.",
    "[CLS] the [MASK] is [SEP]",          # never_split literals
    "[cls] not-a-special [UNKNOWN]",
    "a" * 101,                            # > max_input_chars_per_word -> [UNK]
    "a" * 100,
    "abc abab xab ba",                    # greedy longest-match stress
    "..,,--..",                           # pure punctuation runs
    "x.x,x-x",
    "the\x00lungs\x01are\x7fclear",       # NUL + control chars dropped
    "-leading and trailing- .",
    "word" + "." * 50,
]

NON_ASCII = ["café effusion", "lungs — clear", "x�y",
             "é", "effusion normal"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def handle(vocab_file):
    h = native_ops.wp_create(vocab_file)
    if h is None:
        pytest.skip("native library unavailable")
    return h


def _reports(limit=None):
    texts = []
    for tsv in sorted(glob.glob(os.path.join(REF_TEXT, "data_subfolder_*.tsv"))):
        with open(tsv, encoding="utf-8") as f:
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) >= 5 and cols[-1]:
                    texts.append(cols[-1])
    return texts[:limit] if limit else texts


def test_crlf_vocab_matches_python(handle, tmp_path):
    """A CRLF (or lone-CR) vocab.txt must yield the same keys/indices on
    both paths: Python reads in text mode (universal newlines), and the
    native reader splits '\\n' / '\\r\\n' / lone '\\r' identically — a
    stale binary-mode reader kept 'token\\r' keys, so every native lookup
    missed and ASCII text silently encoded as all-[UNK]."""
    for name, sep in (("crlf", "\r\n"), ("cr", "\r")):
        p = tmp_path / f"vocab_{name}.txt"
        p.write_bytes(sep.join(VOCAB).encode() + sep.encode())
        h = native_ops.wp_create(str(p))
        if h is None:
            pytest.skip("native library unavailable")
        py = WordPieceTokenizer.from_pretrained(str(p))
        text = "the lungs are clear. heart size is normal, unchanged."
        native = native_ops.wp_encode(h, text)
        assert native is not None
        expected = py.encode_wordpiece_ids(text)
        assert native == expected
        assert py.vocab.get("[UNK]") not in expected  # real ids, not UNKs
        native_ops.wp_destroy(h)


def test_native_handle_finalizer_releases(vocab_file):
    tok = NativeWordPieceTokenizer.from_pretrained(vocab_file)
    if tok._native_handle is None:
        pytest.skip("native library unavailable")
    fin = tok._finalizer
    assert fin.alive
    del tok
    import gc
    gc.collect()
    assert not fin.alive  # wp_destroy ran exactly once


def test_native_matches_python_adversarial(vocab_file, handle):
    py = WordPieceTokenizer.from_pretrained(vocab_file)
    for text in ADVERSARIAL:
        native = native_ops.wp_encode(handle, text)
        assert native is not None, repr(text)
        assert native == py.encode_wordpiece_ids(text), repr(text[:60])


def test_native_refuses_non_ascii(vocab_file, handle):
    tok = NativeWordPieceTokenizer.from_pretrained(vocab_file)
    py = WordPieceTokenizer.from_pretrained(vocab_file)
    for text in NON_ASCII:
        assert native_ops.wp_encode(handle, text) is None, repr(text)
        # the facade falls back to the exact Python path
        assert tok.encode_wordpiece_ids(text) == py.encode_wordpiece_ids(text)


def test_native_matches_python_fixture_corpus(handle, tmp_path):
    """Full shipped report corpus with a REAL vocab: build one from every
    wordpiece the python tokenizer needs, so the native greedy matcher is
    exercised on realistic subword tilings, not just [UNK]s."""
    texts = _reports()
    if not texts:
        pytest.skip("reference fixture corpus unavailable")
    # derive a vocab: every whole word + its pieces from a char-level seed
    chars = sorted({c for t in texts for c in t.lower() if c.isalnum()})
    seed = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
            + chars + ["##" + c for c in chars])
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(seed) + "\n")
    py = WordPieceTokenizer.from_pretrained(str(vocab_path))
    # add the 500 most frequent full words so the matcher takes long paths
    freq = {}
    for t in texts:
        for w in py.basic.tokenize(t):
            freq[w] = freq.get(w, 0) + 1
    top = [w for w, _ in sorted(freq.items(), key=lambda kv: -kv[1])[:500]]
    vocab_path.write_text("\n".join(seed + top) + "\n")
    py = WordPieceTokenizer.from_pretrained(str(vocab_path))
    h = native_ops.wp_create(str(vocab_path))
    assert h is not None
    n_native = 0
    for t in texts:
        native = native_ops.wp_encode(h, t)
        if native is None:           # non-ASCII report: python path both sides
            continue
        n_native += 1
        assert native == py.encode_wordpiece_ids(t), t[:80]
    assert n_native >= len(texts) * 0.9  # corpus is essentially all ASCII
    native_ops.wp_destroy(h)


def test_facade_and_features_parity(vocab_file):
    from mimm_tpu.data.features import (InputExample,
                                        convert_examples_to_features)
    native_tok = NativeWordPieceTokenizer.from_pretrained(vocab_file)
    py_tok = WordPieceTokenizer.from_pretrained(vocab_file)
    examples = [InputExample(report_id=str(i), guid=f"dev-{i}", text_a=t,
                             labels="-1")
                for i, t in enumerate(ADVERSARIAL + NON_ASCII)]
    a = convert_examples_to_features(examples, 16, native_tok)
    b = convert_examples_to_features(examples, 16, py_tok)
    for fa, fb in zip(a, b):
        assert fa == fb


def test_threaded_featurization_matches_serial(vocab_file, monkeypatch):
    from mimm_tpu.data import features
    from mimm_tpu.data.features import (InputExample,
                                        convert_examples_to_features)
    tok = NativeWordPieceTokenizer.from_pretrained(vocab_file)
    if not tok.native_gil_free:
        pytest.skip("native library unavailable")
    # force the thread-pool branch even on a 1-core dev box
    monkeypatch.setattr(features.os, "cpu_count", lambda: 8)
    texts = _reports(limit=64) or ["the lungs are clear."] * 64
    examples = [InputExample(report_id=str(i), guid=f"dev-{i}", text_a=t,
                             labels="-1")
                for i, t in enumerate(texts)]
    serial = convert_examples_to_features(examples, 64, tok, num_workers=0)
    threaded = convert_examples_to_features(examples, 64, tok, num_workers=4)
    assert serial == threaded


def test_pickle_drops_native_handle(vocab_file):
    import pickle
    tok = NativeWordPieceTokenizer.from_pretrained(vocab_file)
    clone = pickle.loads(pickle.dumps(tok))
    assert clone._native_handle is None
    text = "the lungs are clear."
    assert (clone.encode_wordpiece_ids(text)
            == tok.encode_wordpiece_ids(text))
