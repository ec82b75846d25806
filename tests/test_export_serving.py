"""tools/export_serving.py: StableHLO serving artifacts must reproduce
the live InferenceSession exactly (weights baked as constants), reload
via jax.export.deserialize without any repo model code on the import
path, and record honest manifests."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.test_serve import _make_artifacts  # noqa: E402


def _add_text_artifacts(tmp_path):
    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.models.bert import BertConfig, TextBert

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, num_classes=1)
    tb = TextBert(cfg)
    v = tb.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    sd = ckpt.bert_state_dict_from_variables(v, cfg.num_hidden_layers)
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_text_model.bin"), sd)
    cfg.to_json_file(str(tmp_path / "config.json"))
    return cfg


def test_export_roundtrip_matches_session(tmp_path):
    from export_serving import export_artifacts, load_exported

    from mimm_tpu.serve import InferenceSession

    _make_artifacts(tmp_path)
    bert_cfg = _add_text_artifacts(tmp_path)
    out = tmp_path / "exported"
    manifest = export_artifacts(str(tmp_path), str(out), batch_size=4,
                                disease="Pneumonia", classifier_layers=[16],
                                max_seq_length=16)

    assert set(manifest["entries"]) == {"embed_images", "embed_texts",
                                        "classify"}
    for name, e in manifest["entries"].items():
        assert os.path.exists(out / e["file"]), name
        assert e["inputs"][0]["shape"][0] == 4
    # manifest on disk round-trips
    assert json.load(open(out / "manifest.json")) == manifest

    sess = InferenceSession(str(tmp_path), batch_size=4,
                            bert_config=bert_cfg,
                            classifier_layers=[16], disease="Pneumonia",
                            max_seq_length=16)
    rng = np.random.default_rng(0)
    imgs = rng.random((4, 256, 256, 1)).astype(np.float32)

    emb_art = np.asarray(load_exported(str(out), "embed_images")(imgs))
    np.testing.assert_allclose(emb_art, sess.embed_images(imgs),
                               rtol=1e-5, atol=1e-6)

    probs_art = np.asarray(load_exported(str(out), "classify")(imgs))
    np.testing.assert_allclose(probs_art, sess.classify(imgs),
                               rtol=1e-5, atol=1e-6)

    ids = rng.integers(0, 64, (4, 16)).astype(np.int32)
    masks = np.ones((4, 16), np.int32)
    segs = np.zeros((4, 16), np.int32)
    txt_art = np.asarray(load_exported(str(out), "embed_texts")(
        ids, masks, segs))
    np.testing.assert_allclose(txt_art, sess.embed_texts(ids, masks, segs),
                               rtol=1e-5, atol=1e-6)


def test_export_image_only_directory(tmp_path):
    """A checkpoint dir without text/classifier artifacts exports just
    embed_images (no silent half-broken entries)."""
    from export_serving import export_artifacts

    _make_artifacts(tmp_path)
    manifest = export_artifacts(str(tmp_path), str(tmp_path / "exp"),
                                batch_size=2)
    assert set(manifest["entries"]) == {"embed_images"}
