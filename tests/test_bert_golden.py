"""Golden test: our flax BERT == HuggingFace torch BertModel with the same
weights (HF transformers' BertModel is architecture-identical to the
pytorch_transformers-1.0.0 model the reference uses; reference
model.py:54-105)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.checkpoint import bert_variables_from_state_dict
from mimm_tpu.models.bert import BertConfig, BertModel


@pytest.mark.parametrize("seed", [0])
def test_bert_matches_transformers(seed):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
    )
    torch.manual_seed(seed)
    hf = transformers.BertModel(hf_cfg).eval()

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 64, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    segs = np.zeros((2, 10), np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 token_type_ids=torch.tensor(segs))
    want_hidden = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    variables = bert_variables_from_state_dict(sd, num_layers=2)

    cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    model = BertModel(cfg)
    hidden, pooled = model.apply({"params": variables["params"]["bert"]},
                                 jnp.asarray(ids), jnp.asarray(segs),
                                 jnp.asarray(mask))

    np.testing.assert_allclose(np.asarray(hidden), want_hidden, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, atol=2e-5, rtol=1e-4)
