"""Pure-Python WordPiece tokenizer, vocab-file compatible with BertTokenizer.

The reference tokenizes reports with pytorch_transformers' BertTokenizer
loaded from a local vocab dir (multi_modal.py:44).  This is the standard
public BERT WordPiece algorithm (basic tokenization: clean/lower/strip
accents/split punctuation, then greedy longest-match-first wordpiece with
'##' continuations) reimplemented without torch, so the data pipeline has
zero framework dependencies and can run in C++-backed worker processes
later.  Parity is tested against transformers.BertTokenizer in
tests/test_tokenizer.py.
"""

from __future__ import annotations

import collections
import os
import unicodedata
import weakref
from typing import Dict, List, Optional


def load_vocab(vocab_file: str) -> Dict[str, int]:
    vocab = collections.OrderedDict()
    with open(vocab_file, encoding="utf-8") as f:
        for i, line in enumerate(f):
            token = line.rstrip("\n")
            vocab[token] = i
    return vocab


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


class BasicTokenizer:
    """Whitespace/punctuation/accent normalization (BERT 'basic' stage)."""

    def __init__(self, do_lower_case: bool = True,
                 never_split: Optional[List[str]] = None):
        self.do_lower_case = do_lower_case
        self.never_split = set(never_split or
                               ["[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]"])

    def tokenize(self, text: str) -> List[str]:
        text = self._clean_text(text)
        tokens = text.split()
        out = []
        for tok in tokens:
            if tok in self.never_split:
                out.append(tok)
                continue
            if self.do_lower_case:
                tok = tok.lower()
                tok = self._strip_accents(tok)
            out.extend(self._split_punct(tok))
        return " ".join(out).split()

    @staticmethod
    def _clean_text(text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    @staticmethod
    def _strip_accents(text: str) -> str:
        text = unicodedata.normalize("NFD", text)
        return "".join(ch for ch in text if unicodedata.category(ch) != "Mn")

    @staticmethod
    def _split_punct(text: str) -> List[str]:
        out: List[List[str]] = []
        start_new = True
        for ch in text:
            if _is_punctuation(ch):
                out.append([ch])
                start_new = True
            else:
                if start_new:
                    out.append([])
                    start_new = False
                out[-1].append(ch)
        return ["".join(x) for x in out]


class WordpieceTokenizer:
    """Greedy longest-match-first sub-word tokenization."""

    def __init__(self, vocab: Dict[str, int], unk_token: str = "[UNK]",
                 max_input_chars_per_word: int = 100):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_input_chars_per_word = max_input_chars_per_word

    def tokenize(self, text: str) -> List[str]:
        out = []
        for token in text.split():
            chars = list(token)
            if len(chars) > self.max_input_chars_per_word:
                out.append(self.unk_token)
                continue
            is_bad = False
            start = 0
            sub_tokens = []
            while start < len(chars):
                end = len(chars)
                cur = None
                while start < end:
                    substr = "".join(chars[start:end])
                    if start > 0:
                        substr = "##" + substr
                    if substr in self.vocab:
                        cur = substr
                        break
                    end -= 1
                if cur is None:
                    is_bad = True
                    break
                sub_tokens.append(cur)
                start = end
            out.extend([self.unk_token] if is_bad else sub_tokens)
        return out


class WordPieceTokenizer:
    """BertTokenizer-compatible facade: ``from_pretrained(dir)`` reads
    ``vocab.txt``; ``tokenize`` + ``convert_tokens_to_ids`` as used by the
    reference featurizer (model_utils.py:480-501)."""

    def __init__(self, vocab: Dict[str, int], do_lower_case: bool = True):
        self.vocab = vocab
        self.ids_to_tokens = {i: t for t, i in vocab.items()}
        self.basic = BasicTokenizer(do_lower_case=do_lower_case)
        self.wordpiece = WordpieceTokenizer(vocab)

    @classmethod
    def from_pretrained(cls, vocab_dir_or_file: str, do_lower_case: bool = True
                        ) -> "WordPieceTokenizer":
        path = vocab_dir_or_file
        if os.path.isdir(path):
            path = os.path.join(path, "vocab.txt")
        return cls(load_vocab(path), do_lower_case=do_lower_case)

    def tokenize(self, text: str) -> List[str]:
        out = []
        for tok in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(tok))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        unk = self.vocab.get("[UNK]", 0)
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.ids_to_tokens.get(i, "[UNK]") for i in ids]

    def encode_wordpiece_ids(self, text: str) -> List[int]:
        """Wordpiece ids for ``text`` WITHOUT [CLS]/[SEP] — the featurizer's
        one-call form (the name is deliberately NOT ``encode``: transformers'
        ``encode`` adds special tokens, and the featurizer must not confuse
        the two when handed an HF tokenizer)."""
        return self.convert_tokens_to_ids(self.tokenize(text))

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)


class NativeWordPieceTokenizer(WordPieceTokenizer):
    """WordPieceTokenizer whose ``encode_wordpiece_ids`` runs in the C++
    host library (native/mimm_host.cpp mimm_wp_encode) for ASCII text —
    GIL-free, so featurization fans out over THREADS even when a jax
    backend is live (forking is a deadlock hazard then, see
    features.convert_examples_to_features).  Non-ASCII texts and a missing
    native library fall back to the exact pure-Python path; parity is
    proven token-for-token in tests/test_native_wordpiece.py.

    Use ``from_pretrained``; it degrades to the pure-Python facade
    silently when the library cannot be built."""

    def __init__(self, vocab, do_lower_case: bool = True,
                 native_handle=None):
        super().__init__(vocab, do_lower_case=do_lower_case)
        self._native_handle = native_handle
        if native_handle is not None:
            from mimm_tpu.data import native_ops
            # Release the C++ vocab map when this tokenizer is collected
            # (weakref.finalize is interpreter-shutdown-safe: at shutdown
            # unrun finalizers are called while modules still exist, and
            # we capture the destroy function itself, not the module).
            self._finalizer = weakref.finalize(
                self, native_ops.wp_destroy, native_handle)

    @property
    def native_gil_free(self) -> bool:
        return self._native_handle is not None

    @classmethod
    def from_pretrained(cls, vocab_dir_or_file: str, do_lower_case: bool = True
                        ) -> "NativeWordPieceTokenizer":
        from mimm_tpu.data import native_ops
        path = vocab_dir_or_file
        if os.path.isdir(path):
            path = os.path.join(path, "vocab.txt")
        return cls(load_vocab(path), do_lower_case=do_lower_case,
                   native_handle=native_ops.wp_create(path))

    def encode_wordpiece_ids(self, text: str) -> List[int]:
        if self._native_handle is not None:
            from mimm_tpu.data import native_ops
            ids = native_ops.wp_encode(self._native_handle, text,
                                       self.basic.do_lower_case)
            if ids is not None:
                return ids
        return super().encode_wordpiece_ids(text)

    # The handle is a raw C pointer: valid across fork (the pool's start
    # method), garbage in a spawn/pickle round-trip — drop it there and let
    # the unpickled copy run the pure-Python path.
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_native_handle"] = None
        state.pop("_finalizer", None)  # finalizers are not picklable
        return state
