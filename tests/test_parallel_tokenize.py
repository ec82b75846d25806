"""Parallel (process-pool) tokenization parity — reference parity for
model_utils.py:539-543 ``Pool(cpu_count()-1)``.

The pool path runs only with spare cores and no live jax backend (fork
hazard), so the parity check executes in a clean subprocess with the
guards monkeypatched; in-process tests cover the guard behavior itself.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, %r)
from mimm_tpu.data import features as F
from mimm_tpu.data.tokenizer import WordPieceTokenizer

# tiny vocab tokenizer (wordpiece with ## continuations)
vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "lung", "##s", "clear",
         "no", "ple", "##ural", "eff", "##usion", "heart", "size", "normal"]
import tempfile
d = tempfile.mkdtemp()
with open(os.path.join(d, "vocab.txt"), "w") as f:
    f.write("\n".join(vocab))
tok = WordPieceTokenizer.from_pretrained(d)

examples = [F.InputExample(report_id=str(100 + i), guid=f"t-{i}",
                           text_a="the lungs clear no pleural effusion " * (1 + i %% 5),
                           labels=str(i %% 4))
            for i in range(200)]

serial = F.convert_examples_to_features(examples, 48, tok, num_workers=0)
# force the pool on: pretend 4 cores and no jax backend
F.os.cpu_count = lambda: 4
F._jax_backend_live = lambda: False
parallel = F.convert_examples_to_features(examples, 48, tok, num_workers=3)
assert len(serial) == len(parallel)
for a, b in zip(serial, parallel):
    assert a == b, (a, b)
print("PARITY_OK", len(parallel))
"""


def test_pool_tokenization_matches_serial():
    out = subprocess.run([sys.executable, "-c", _CHILD % REPO],
                         capture_output=True, text=True, timeout=300,
                         env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PARITY_OK 200" in out.stdout


def test_pool_guard_serial_with_live_backend():
    """With a live jax backend the converter must NOT fork — it falls back
    to the serial path and still produces features."""
    import jax

    from mimm_tpu.data import features as F
    jax.devices()  # ensure the backend exists
    assert F._jax_backend_live() is True

    class EchoTok:
        def tokenize(self, text):
            return text.split()

        def convert_tokens_to_ids(self, tokens):
            return [1] * len(tokens)

    ex = [F.InputExample(report_id="1", guid="g", text_a="a b c", labels="0")]
    feats = F.convert_examples_to_features(ex, 8, EchoTok(), num_workers=8)
    assert len(feats) == 1 and feats[0].label_id == 0
