"""InferenceSession: checkpoint loading + padded batch serving."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mimm_tpu import checkpoint as ckpt
from mimm_tpu.models.mlp import BasicMLP
from mimm_tpu.models.resnet import ResNet256_6_2_1
from mimm_tpu.serve import InferenceSession


def _make_artifacts(tmp_path):
    """Write reference-named image-model + classifier checkpoints."""
    model = ResNet256_6_2_1(output_channels=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)),
                           train=False)
    sd = ckpt.resnet_state_dict_from_variables(
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables["batch_stats"])})
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_image_model.bin"), sd)

    mlp = BasicMLP(768, [16])
    params = mlp.init(jax.random.PRNGKey(1))
    clf_sd = ckpt.mlp_state_dict_from_params(jax.device_get(params))
    ckpt.save_state_dict_bin(
        str(tmp_path / "pytorch_image_classifier_Pneumonia_epoch3.bin"), clf_sd)
    return variables


def test_serve_embeds_and_classifies_with_padding(tmp_path):
    variables = _make_artifacts(tmp_path)
    sess = InferenceSession(str(tmp_path), batch_size=4,
                            classifier_layers=[16], disease="Pneumonia")

    rng = np.random.default_rng(0)
    imgs = rng.random((6, 256, 256, 1)).astype(np.float32)  # 6 % 4 != 0
    emb = sess.embed_images(imgs)
    assert emb.shape == (6, 768)

    # serving result == direct model apply (no padding contamination)
    model = ResNet256_6_2_1(output_channels=1)
    want = model.apply(variables, jnp.asarray(imgs), train=False)[1]
    np.testing.assert_allclose(emb, np.asarray(want), rtol=2e-4, atol=2e-4)

    probs = sess.classify(imgs)
    assert probs.shape == (6,)
    assert (probs > 0).all() and (probs < 1).all()


def test_serve_errors_without_classifier(tmp_path):
    _make_artifacts(tmp_path)
    sess = InferenceSession(str(tmp_path), batch_size=4)
    import pytest
    with pytest.raises(RuntimeError, match="no classifier"):
        sess.classify(np.zeros((2, 256, 256, 1), np.float32))


def test_serve_embed_texts(tmp_path):
    from mimm_tpu.models.bert import BertConfig, TextBert

    _make_artifacts(tmp_path)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, num_classes=1)
    # export a tiny text model under the reference name
    tb = TextBert(cfg)
    v = tb.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    sd = ckpt.bert_state_dict_from_variables(v, cfg.num_hidden_layers)
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_text_model.bin"), sd)

    sess = InferenceSession(str(tmp_path), batch_size=4, bert_config=cfg)
    ids = np.ones((5, 8), np.int32)
    masks = np.ones((5, 8), np.int32)
    segs = np.zeros((5, 8), np.int32)
    emb = sess.embed_texts(ids, masks, segs)
    assert emb.shape == (5, 32)
    want = tb.apply(v, jnp.asarray(ids), token_type_ids=jnp.asarray(segs),
                    attention_mask=jnp.asarray(masks))[0]
    np.testing.assert_allclose(emb, np.asarray(want), rtol=2e-4, atol=2e-5)


def test_serve_int8_weight_quantization_quality(tmp_path):
    """weight_dtype='int8' (serve.py _quantize_weights): per-output-
    channel symmetric int8 must preserve embeddings (cosine vs the f32
    session through the full 6-stage ResNet) and classifier
    probabilities; padding semantics unchanged."""
    _make_artifacts(tmp_path)
    f32 = InferenceSession(str(tmp_path), batch_size=4,
                           classifier_layers=[16], disease="Pneumonia")
    q8 = InferenceSession(str(tmp_path), batch_size=4,
                          classifier_layers=[16], disease="Pneumonia",
                          weight_dtype="int8")

    rng = np.random.default_rng(1)
    imgs = rng.random((6, 256, 256, 1)).astype(np.float32)
    e32, e8 = f32.embed_images(imgs), q8.embed_images(imgs)
    assert e8.shape == (6, 768) and e8.dtype == np.float32
    cos = np.sum(e32 * e8, -1) / (np.linalg.norm(e32, axis=-1)
                                  * np.linalg.norm(e8, axis=-1))
    assert cos.min() > 0.99, cos
    p32, p8 = f32.classify(imgs), q8.classify(imgs)
    np.testing.assert_allclose(p8, p32, atol=0.05)


def test_serve_int8_bert_quality(tmp_path):
    """int8 weight quantization through a 2-layer BERT text tower:
    pooled-CLS embeddings stay close to the f32 session's."""
    from mimm_tpu.models.bert import BertConfig, TextBert

    _make_artifacts(tmp_path)
    bc = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=32, num_classes=1)
    model = TextBert(bc)
    ids0 = jnp.zeros((1, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(2), ids0)
    sd = ckpt.bert_state_dict_from_variables(
        {"params": jax.device_get(variables["params"])}, bc.num_hidden_layers)
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_text_model.bin"), sd)

    f32 = InferenceSession(str(tmp_path), batch_size=4, bert_config=bc)
    q8 = InferenceSession(str(tmp_path), batch_size=4, bert_config=bc,
                          weight_dtype="int8")
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 64, (5, 16)).astype(np.int32)
    masks = np.ones((5, 16), np.int32)
    segs = np.zeros((5, 16), np.int32)
    e32 = f32.embed_texts(ids, masks, segs)
    e8 = q8.embed_texts(ids, masks, segs)
    cos = np.sum(e32 * e8, -1) / (np.linalg.norm(e32, axis=-1)
                                  * np.linalg.norm(e8, axis=-1))
    assert cos.min() > 0.99, cos


def test_serve_embed_reports_raw_text(tmp_path):
    """embed_reports: raw report strings tokenize server-side with the
    training featurization ([CLS] + WordPiece + [SEP], pad to
    max_seq_length) and must equal the pre-tokenized embed_texts path."""
    from mimm_tpu.data.tokenizer import WordPieceTokenizer
    from mimm_tpu.models.bert import BertConfig, TextBert

    _make_artifacts(tmp_path)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, num_classes=1)
    tb = TextBert(cfg)
    v = tb.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    sd = ckpt.bert_state_dict_from_variables(v, cfg.num_hidden_layers)
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_text_model.bin"), sd)
    from tests.test_data import VOCAB
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    sess = InferenceSession(str(tmp_path), batch_size=4, bert_config=cfg,
                            vocab_dir=str(tmp_path), max_seq_length=16)
    texts = ["The lungs are clear.", "No acute cardiopulmonary process",
             "Pleural effusion is unchanged"]
    emb = sess.embed_reports(texts)
    assert emb.shape == (3, 32) and np.isfinite(emb).all()

    # equals the pre-tokenized path through the same tokenizer
    tok = WordPieceTokenizer.from_pretrained(str(tmp_path))
    ids = np.zeros((3, 16), np.int32)
    masks = np.zeros((3, 16), np.int32)
    for i, t in enumerate(texts):
        row = tok.convert_tokens_to_ids(
            ["[CLS]"] + tok.tokenize(t)[:14] + ["[SEP]"])
        ids[i, :len(row)] = row
        masks[i, :len(row)] = 1
    np.testing.assert_array_equal(
        emb, sess.embed_texts(ids, masks, np.zeros_like(ids)))

    # no vocab -> clear error
    import pytest
    no_vocab = InferenceSession(str(tmp_path), batch_size=4, bert_config=cfg)
    with pytest.raises(RuntimeError, match="no tokenizer"):
        no_vocab.embed_reports(["text"])


def test_dynamic_batcher_coalesces_and_scatters():
    """DynamicBatcher: concurrent single-row submits coalesce into few
    full-batch calls; every caller gets exactly its rows back."""
    import concurrent.futures as cf

    from mimm_tpu.serve import DynamicBatcher

    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2.0

    b = DynamicBatcher(fn, batch_size=8, max_wait_ms=200)
    try:
        xs = [np.full((1, 3), i, np.float32) for i in range(8)]
        with cf.ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(lambda a: b.submit(a), xs))
        for i, o in enumerate(outs):
            np.testing.assert_array_equal(o, xs[i] * 2)
        assert sum(calls) == 8
        assert len(calls) < 8, f"no coalescing happened: {calls}"
    finally:
        b.close()


def test_dynamic_batcher_shape_groups_multi_array_and_errors():
    from mimm_tpu.serve import DynamicBatcher
    import concurrent.futures as cf
    import pytest

    calls = []

    def fn(ids, masks):
        calls.append(ids.shape)
        if ids.shape[1] == 7:
            raise ValueError("bad length")
        return ids + masks

    b = DynamicBatcher(fn, batch_size=4, max_wait_ms=100)
    try:
        a16 = (np.ones((2, 16), np.int32), np.ones((2, 16), np.int32))
        a8 = (np.full((1, 8), 3, np.int32), np.ones((1, 8), np.int32))
        bad = (np.ones((1, 7), np.int32), np.ones((1, 7), np.int32))
        with cf.ThreadPoolExecutor(3) as ex:
            f16 = ex.submit(b.submit, *a16)
            f8 = ex.submit(b.submit, *a8)
            fbad = ex.submit(b.submit, *bad)
            np.testing.assert_array_equal(f16.result(timeout=30),
                                          np.full((2, 16), 2))
            np.testing.assert_array_equal(f8.result(timeout=30),
                                          np.full((1, 8), 4))
            with pytest.raises(ValueError, match="bad length"):
                fbad.result(timeout=30)
        # incompatible shapes were never concatenated together
        assert all(s[1] in (16, 8, 7) for s in calls)
    finally:
        b.close()
