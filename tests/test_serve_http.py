"""HTTP serving entry point (cli/serve.py): endpoint contracts over a live
ThreadingHTTPServer with a real InferenceSession behind it."""

import io
import json
import sys
import os
import threading
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cli"))

from tests.test_serve import _make_artifacts  # noqa: E402


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_http_server_endpoints(tmp_path):
    import serve as serve_cli

    _make_artifacts(tmp_path)
    server = serve_cli.build_server(str(tmp_path), port=0, batch_size=4,
                                    disease="Pneumonia",
                                    classifier_layers=[16])
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read().decode())
        assert health["status"] == "ok" and health["classifier"] is True

        rng = np.random.default_rng(0)
        # npy body, integer images (server normalizes on device like training)
        imgs = rng.integers(0, 255, (3, 256, 256)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, imgs)
        code, out = _post(base + "/embed_images", buf.getvalue(),
                          "application/x-npy")
        assert code == 200
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (3, 768) and np.isfinite(emb).all()

        # JSON body classify
        small = rng.random((2, 256, 256)).astype(np.float32)
        code, out = _post(base + "/classify",
                          json.dumps({"images": small.tolist()}).encode(),
                          "application/json")
        assert code == 200
        probs = np.asarray(out["probabilities"])
        assert probs.shape == (2,) and ((probs > 0) & (probs < 1)).all()

        # malformed payload -> 400 with an error message
        code, out = _post(base + "/embed_images", b"not npy",
                          "application/json")
        assert code == 400 and "error" in out

        code, out = _post(base + "/nope", b"{}", "application/json")
        assert code == 404

        # no text model in this save dir -> /embed_texts is a clean 400
        assert health["text_model"] is False
        code, out = _post(base + "/embed_texts",
                          json.dumps({"texts": ["hi"]}).encode(),
                          "application/json")
        assert code == 400 and "error" in out
    finally:
        server.shutdown()
        server.server_close()


def test_http_dynamic_batching(tmp_path):
    """--dynamic_batching: concurrent requests coalesce behind the
    DynamicBatcher and every caller still gets its own rows."""
    import concurrent.futures as cf

    import serve as serve_cli

    from mimm_tpu.serve import InferenceSession

    _make_artifacts(tmp_path)
    server = serve_cli.build_server(str(tmp_path), port=0, batch_size=4,
                                    dynamic_batching=True, batch_wait_ms=50)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    rng = np.random.default_rng(3)
    imgs = rng.random((3, 256, 256, 1)).astype(np.float32)
    sess = InferenceSession(str(tmp_path), batch_size=4)
    want = sess.embed_images(imgs)
    try:
        def post_one(i):
            body = json.dumps({"images": imgs[i:i + 1].tolist()}).encode()
            return _post(base + "/embed_images", body, "application/json")

        with cf.ThreadPoolExecutor(3) as ex:
            results = list(ex.map(post_one, range(3)))
        for i, (code, out) in enumerate(results):
            assert code == 200
            got = np.asarray(out["embeddings"])
            np.testing.assert_allclose(got[0], want[i], rtol=1e-4, atol=1e-5)
    finally:
        server.shutdown()
        server.server_close()


def test_http_embed_texts(tmp_path):
    """POST /embed_texts: raw strings (server-side WordPiece via
    --bert_pretrained_dir) and pre-tokenized arrays both serve; the bert
    config comes from bert_config.json in the pretrained dir."""
    import jax
    import jax.numpy as jnp
    import serve as serve_cli

    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.models.bert import BertConfig, TextBert
    from tests.test_data import VOCAB

    _make_artifacts(tmp_path)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32, num_classes=1)
    tb = TextBert(cfg)
    v = tb.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    sd = ckpt.bert_state_dict_from_variables(v, cfg.num_hidden_layers)
    ckpt.save_state_dict_bin(str(tmp_path / "pytorch_MI_text_model.bin"), sd)
    cfg.to_json_file(str(tmp_path / "bert_config.json"))
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")

    server = serve_cli.build_server(str(tmp_path), port=0, batch_size=4,
                                    bert_pretrained_dir=str(tmp_path),
                                    max_seq_length=16)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read().decode())["text_model"] is True
        code, out = _post(
            base + "/embed_texts",
            json.dumps({"texts": ["the lungs are clear",
                                  "no acute process"]}).encode(),
            "application/json")
        assert code == 200
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (2, 32) and np.isfinite(emb).all()

        ids = np.ones((2, 16), np.int32)
        code, out = _post(
            base + "/embed_texts",
            json.dumps({"input_ids": ids.tolist(),
                        "attention_mask": ids.tolist()}).encode(),
            "application/json")
        assert code == 200
        assert np.asarray(out["embeddings"]).shape == (2, 32)
    finally:
        server.shutdown()
        server.server_close()
