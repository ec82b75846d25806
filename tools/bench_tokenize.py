"""Featurization throughput: native C++ WordPiece vs pure Python.

Reproduces the session-8 measurement (ROUND2.md): the native encoder
(native/mimm_host.cpp mimm_wp_encode) vs the pure-Python tokenizer on
the shipped fixture reports, with a realistic vocab (chars + ##chars +
top-2000 corpus words) so the greedy matcher takes real subword paths.
Asserts token-identical output before timing.  No jax dependency.

Usage: python tools/bench_tokenize.py [--repeats 30]
"""

import argparse
import csv
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TEXT = "/root/reference/full_data_set/text"


def load_reports():
    texts = []
    for tsv in sorted(glob.glob(os.path.join(REF_TEXT, "data_subfolder_*.tsv"))):
        with open(tsv, encoding="utf-8") as f:
            for cols in csv.reader(f, delimiter="\t"):
                if len(cols) >= 5 and cols[-1]:
                    texts.append(cols[-1])
    return texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=30,
                    help="corpus replication factor (110 reports each)")
    ap.add_argument("--vocab", default=None,
                    help="existing vocab.txt (default: derive from corpus)")
    args = ap.parse_args()

    from mimm_tpu.data import native_ops
    from mimm_tpu.data.tokenizer import WordPieceTokenizer

    base = load_reports()
    if not base:
        sys.exit(f"no fixture reports under {REF_TEXT}")
    texts = base * args.repeats

    if args.vocab:
        vocab_path = args.vocab
    else:
        chars = sorted({c for t in base for c in t.lower() if c.isalnum()})
        seed = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                + chars + ["##" + c for c in chars])
        py0 = WordPieceTokenizer({t: i for i, t in enumerate(seed)})
        freq = {}
        for t in base:
            for w in py0.basic.tokenize(t):
                freq[w] = freq.get(w, 0) + 1
        top = [w for w, _ in sorted(freq.items(), key=lambda kv: -kv[1])[:2000]]
        vocab_path = "/tmp/mimm_bench_vocab.txt"
        with open(vocab_path, "w") as f:
            f.write("\n".join(seed + top) + "\n")

    py = WordPieceTokenizer.from_pretrained(vocab_path)
    handle = native_ops.wp_create(vocab_path)
    if handle is None:
        sys.exit("native library unavailable (g++ missing?)")

    # parity first, then timing
    n_fallback = 0
    for t in base:
        native = native_ops.wp_encode(handle, t)
        if native is None:
            n_fallback += 1
            continue
        assert native == py.encode_wordpiece_ids(t), t[:80]

    t0 = time.perf_counter()
    tok_py = sum(len(py.encode_wordpiece_ids(t)) for t in texts)
    t1 = time.perf_counter()
    tok_nat = sum(len(native_ops.wp_encode(handle, t)
                      or py.encode_wordpiece_ids(t)) for t in texts)
    t2 = time.perf_counter()
    assert tok_py == tok_nat

    py_s, nat_s = t1 - t0, t2 - t1
    print(f"reports={len(texts)} tokens={tok_py} "
          f"non_ascii_fallbacks={n_fallback}/{len(base)}")
    print(f"python : {py_s:.3f}s  {len(texts) / py_s:8.0f} reports/s")
    print(f"native : {nat_s:.3f}s  {len(texts) / nat_s:8.0f} reports/s  "
          f"({py_s / nat_s:.1f}x)")
    native_ops.wp_destroy(handle)


if __name__ == "__main__":
    main()
