"""Dropout mask variants (ops/dropout.py): statistical + semantic checks
for the byte-packed and uint8-threshold implementations, and the BERT
config dispatch.  Both are nn.Dropout-compatible in semantics (Bernoulli
keep, 1/(1-p) scaling); only the keep-prob resolution differs (1/256)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.ops.dropout import packed_dropout, u8_dropout


@pytest.mark.parametrize("fn", [packed_dropout, u8_dropout])
def test_dropout_semantics(fn):
    x = jnp.ones((256, 512), jnp.float32)
    key = jax.random.PRNGKey(0)

    # deterministic / rate 0 are identity; rate >= 1 zeroes
    assert np.array_equal(fn(x, 0.1, key, deterministic=True), x)
    assert np.array_equal(fn(x, 0.0, key), x)
    assert np.array_equal(fn(x, 1.0, key), jnp.zeros_like(x))

    for rate in (0.1, 0.5):
        out = np.asarray(jax.jit(lambda k: fn(x, rate, k))(key))
        kept = out != 0.0
        # survivors are scaled by exactly 1/(1-rate)
        np.testing.assert_allclose(out[kept], 1.0 / (1.0 - rate), rtol=1e-6)
        # realized keep rate: within the documented 1/256 resolution + noise
        expect = (256 - round(rate * 256)) / 256.0
        assert abs(kept.mean() - expect) < 0.01, (rate, kept.mean())
        # unbiased in expectation (the nn.Dropout contract)
        assert abs(out.mean() - 1.0) < 0.02

    # different keys -> different masks; same key -> same mask
    a = fn(x, 0.5, jax.random.PRNGKey(1))
    b = fn(x, 0.5, jax.random.PRNGKey(2))
    assert not np.array_equal(a, b)
    assert np.array_equal(a, fn(x, 0.5, jax.random.PRNGKey(1)))


def test_u8_dropout_grad():
    x = jnp.ones((64, 64), jnp.float32)

    def loss(x):
        return jnp.sum(u8_dropout(x, 0.1, jax.random.PRNGKey(3)))

    g = np.asarray(jax.grad(loss)(x))
    out = np.asarray(u8_dropout(x, 0.1, jax.random.PRNGKey(3)))
    # gradient is the same mask*scale the forward applied
    np.testing.assert_allclose(g, out, rtol=1e-6)


def test_bert_config_dispatch():
    import flax.linen as nn

    from mimm_tpu.models.bert import BertConfig, _dropout
    from mimm_tpu.ops.dropout import PackedDropout, U8Dropout

    assert isinstance(_dropout(BertConfig(), 0.1), nn.Dropout)
    assert isinstance(_dropout(BertConfig(packed_dropout=True), 0.1),
                      PackedDropout)
    assert isinstance(_dropout(BertConfig(u8_dropout=True), 0.1), U8Dropout)


def test_u8_dropout_in_bert_forward():
    """TextBert trains (init + one fwd with dropout rngs) under u8_dropout
    and produces the exact nn.Dropout output when deterministic."""
    from mimm_tpu.models.bert import BertConfig, TextBert

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, (2, 16)).astype(np.int32))
    kw = dict(vocab_size=100, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64, num_classes=1)
    m_plain = TextBert(BertConfig(**kw))
    m_u8 = TextBert(BertConfig(u8_dropout=True, **kw))
    params = m_plain.init(jax.random.PRNGKey(0), ids)["params"]

    det_plain, _ = m_plain.apply({"params": params}, ids, deterministic=True)
    det_u8, _ = m_u8.apply({"params": params}, ids, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det_plain), np.asarray(det_u8))

    out, _ = m_u8.apply({"params": params}, ids, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()
    assert not np.array_equal(np.asarray(out), np.asarray(det_u8))
