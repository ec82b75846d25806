"""Fused FFN Pallas kernel (ops/fused_ffn.py) vs the unfused XLA formula.

Runs in Pallas interpret mode on the CPU mesh.  The f32 comparison is
the strong one: the kernel saves the pre-GELU activation in the compute
dtype, so at f32 forward and every gradient must match the XLA
tanh-GELU FFN to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimm_tpu.ops.fused_ffn import fused_ffn

D, F = 256, 512  # lane-aligned but small enough for interpret mode


def _ref_ffn(x, w1, b1, w2, b2):
    h = x @ w1 + b1
    return jax.nn.gelu(h, approximate=True) @ w2 + b2


def _inputs(t, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (jax.random.normal(ks[0], (t, D), dtype),
            jax.random.normal(ks[1], (D, F), dtype) * 0.05,
            jax.random.normal(ks[2], (F,), dtype) * 0.05,
            jax.random.normal(ks[3], (F, D), dtype) * 0.05,
            jax.random.normal(ks[4], (D,), dtype) * 0.05)


@pytest.mark.parametrize("t", [256, 64, 100])  # aligned, sub-tile, ragged
def test_forward_matches_xla(t):
    args = _inputs(t)
    got = fused_ffn(*args)
    want = _ref_ffn(*args)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t", [256, 100])
def test_gradients_match_xla(t):
    args = _inputs(t, seed=1)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_ffn(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ref_ffn(*a)))

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for g, w, name in zip(got, want, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-5, err_msg=name)


def test_bfloat16_close():
    args32 = _inputs(192, seed=2)
    args16 = tuple(a.astype(jnp.bfloat16) for a in args32)
    got = fused_ffn(*args16).astype(jnp.float32)
    want = _ref_ffn(*args32)
    np.testing.assert_allclose(got, want, rtol=0.0, atol=0.15)
    assert got.dtype == jnp.float32 and args16[0].dtype == jnp.bfloat16


def test_bert_layer_fused_ffn_matches_unfused():
    """BertLayer with fused_ffn=True: identical param tree, same outputs."""
    from mimm_tpu.models.bert import BertConfig, BertLayer

    cfg = dict(num_hidden_layers=1, hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0, gelu_tanh=True)
    base = BertConfig(**cfg)
    fused = BertConfig(fused_ffn=True, **cfg)
    hidden = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 768))
    bias = jnp.zeros((2, 1, 1, 32))

    layer = BertLayer(base)
    params = layer.init(jax.random.PRNGKey(1), hidden, bias)
    out_base = layer.apply(params, hidden, bias)
    out_fused = BertLayer(fused).apply(params, hidden, bias)  # same tree
    np.testing.assert_allclose(out_fused, out_base, rtol=2e-5, atol=2e-5)
