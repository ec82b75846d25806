"""Model zoo shape/semantics tests (reference 5-tuple contract, AE bottleneck,
BERT pooled output) plus conv-layout golden checks against torch primitives."""

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu.models import (
    BasicMLP,
    BertConfig,
    ImageReportModel,
    ResNet256_6_2_1,
    ResNetAE,
    TextBert,
)

TINY_BERT = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=32, num_classes=1)


def test_resnet_five_tuple_shapes():
    model = ResNet256_6_2_1(output_channels=1, blocks_per_layer=(1,) * 6)
    x = jnp.zeros((2, 256, 256, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y, z, y_sig, z_local, y_logits = model.apply(variables, x, train=False)
    assert y.shape == (2, 1) and y_logits.shape == (2, 1) and y_sig.shape == (2, 1)
    assert z.shape == (2, 768)               # reference embedding dim
    assert z_local.shape == (2, 8, 8, 128)   # layer5 map (NHWC of ref 8x8x128)
    # batch_stats collection exists for BatchNorm
    assert "batch_stats" in variables


def test_resnet_batchnorm_updates_in_train_mode():
    model = ResNet256_6_2_1(output_channels=1, blocks_per_layer=(1,) * 6)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 256, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, new_state = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = variables["batch_stats"]["bn1"]["mean"]
    new = new_state["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_autoencoder_roundtrip_shapes():
    model = ResNetAE(input_shape=(64, 64, 1), n_residual_blocks=1, n_levels=3,
                     z_dim=16, bottleneck_dim=32)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid output
    z = model.apply(variables, x, train=False, method=ResNetAE.encode)
    assert z.shape == (2, 32)


def test_textbert_outputs():
    model = TextBert(TINY_BERT)
    ids = jnp.ones((2, 12), jnp.int32)
    mask = jnp.concatenate([jnp.ones((2, 8), jnp.int32), jnp.zeros((2, 4), jnp.int32)], 1)
    variables = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask)
    pooled, logits = model.apply(variables, ids, attention_mask=mask)
    assert pooled.shape == (2, 16) and logits.shape == (2, 1)
    # padding must not affect the result: change a masked-out token id
    ids2 = ids.at[0, 10].set(3)
    pooled2, _ = model.apply(variables, ids2, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2), atol=1e-5)


def test_joint_model_contract():
    model = ImageReportModel(bert_config=TINY_BERT, output_channels=1)
    img = jnp.zeros((2, 256, 256, 1))
    ids = jnp.ones((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids)
    e_img, e_txt, l_img, l_txt = model.apply(variables, img, ids)
    assert e_img.shape == (2, 768)
    assert e_txt.shape == (2, 16)
    assert l_img.shape == (2, 1) and l_txt.shape == (2, 1)


def test_basic_mlp_sigmoid_range_and_dropout():
    mlp = BasicMLP(8, [4, 2])
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    y = mlp.apply(params, x)
    assert y.shape == (5, 1)
    assert float(y.min()) > 0.0 and float(y.max()) < 1.0
    y_train = mlp.apply(params, x, train=True, dropout_rng=jax.random.PRNGKey(2))
    assert y_train.shape == (5, 1)


def test_conv_layout_matches_torch():
    """Converted torch conv weights produce identical outputs in flax —
    validates the checkpoint layout transposes end-to-end."""
    import torch
    import torch.nn.functional as F
    import flax.linen as nn
    from mimm_tpu.checkpoint import _conv

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)  # (O, I, KH, KW)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)  # NCHW

    want = F.conv2d(torch.tensor(x), torch.tensor(w), stride=2, padding=1).numpy()

    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=1, use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(_conv(w))}}
    got = conv.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_deconv_layout_matches_torch():
    import torch
    import torch.nn.functional as F
    import flax.linen as nn
    from mimm_tpu.checkpoint import _deconv

    rng = np.random.default_rng(1)
    w = rng.normal(size=(6, 4, 2, 2)).astype(np.float32)  # (I, O, KH, KW)
    x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)

    want = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), stride=2).numpy()

    deconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID",
                              use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(_deconv(w))}}
    got = deconv.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_patch_convs_match_flax_convs():
    """PatchConv / PatchConvTranspose are bit-level replacements for
    nn.Conv / nn.ConvTranspose with kernel == stride (same param tree)."""
    import flax.linen as nn
    import jax
    from mimm_tpu.models.autoencoder import PatchConv, PatchConvTranspose

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    for n, feats in ((2, 10), (8, 4)):
        pc = PatchConv(feats, n)
        v = pc.init(rng, x)
        want = nn.Conv(feats, (n, n), strides=(n, n), padding=0).apply(
            {"params": v["params"]}, x)
        np.testing.assert_allclose(np.asarray(pc.apply(v, x)), np.asarray(want),
                                   atol=2e-6)
    z = jax.random.normal(rng, (2, 4, 4, 6))
    for n, feats in ((2, 10), (4, 8)):
        pt = PatchConvTranspose(feats, n)
        v = pt.init(rng, z)
        want = nn.ConvTranspose(feats, (n, n), strides=(n, n),
                                padding="VALID").apply({"params": v["params"]}, z)
        np.testing.assert_allclose(np.asarray(pt.apply(v, z)), np.asarray(want),
                                   atol=2e-6)


def test_gelu_tanh_flag_switches_activation():
    """cfg.gelu_tanh swaps erf GELU for the tanh form (production perf
    knob, bench.py); outputs differ slightly but stay within the
    documented 1e-3-absolute envelope of the activation change."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    ids = jnp.arange(8, dtype=jnp.int32)[None, :] % TINY_BERT.vocab_size
    exact = TextBert(TINY_BERT)
    tanh = TextBert(dataclasses.replace(TINY_BERT, gelu_tanh=True))
    v = exact.init(jax.random.PRNGKey(0), ids)
    p_e, _ = exact.apply(v, ids, deterministic=True)
    p_t, _ = tanh.apply(v, ids, deterministic=True)
    d = float(jnp.max(jnp.abs(p_e - p_t)))
    assert 0.0 < d < 0.05  # different function, small deviation
