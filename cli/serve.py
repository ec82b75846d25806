"""CLI: HTTP model server over mimm_tpu.serve.InferenceSession.

The reference has no serving story (SURVEY.md §0: "no serving path");
this entry point turns trained reference-named checkpoints into a
production inference endpoint on the local TPU:

    python cli/serve.py --save_directory save_dir/dv_epoch20 \
        --disease Pneumonia --port 8321

Endpoints (all JSON unless an npy body is sent):

* ``GET  /healthz``        -> {"status": "ok", "batch_size": N, ...}
* ``POST /embed_images``   -> {"embeddings": [[...768 floats...], ...]}
* ``POST /embed_texts``    -> {"embeddings": ...}  (needs a text model:
  --bert_pretrained_dir, or a config.json already in save_directory).
  Body: {"texts": ["findings ...", ...]} for raw reports (server-side
  WordPiece, needs vocab.txt in --bert_pretrained_dir), or pre-tokenized
  {"input_ids": [[...]], "attention_mask": [[...]],
  "token_type_ids": [[...]]} (token_type_ids optional)
* ``POST /classify``       -> {"probabilities": [p, ...]}  (needs --disease)

Request body formats for the POST endpoints:

* ``application/x-npy`` — a numpy .npy payload of shape (N, H, W) or
  (N, H, W, 1), dtype uint8/uint16/float32.  Integer images are
  normalized on device exactly like training (ops/image_norm.py).
* ``application/json`` — {"images": <nested list>} with the same shapes.

The server is a stdlib ThreadingHTTPServer; request threads funnel into
the jitted fixed-batch entry points (one compile per configured batch
size, amortized across requests).  ``--dynamic_batching true`` coalesces
concurrent requests into full-batch device calls
(mimm_tpu.serve.DynamicBatcher, ``--batch_wait_ms`` accumulation
window) — the padding/dispatch cost of N concurrent single-image
requests collapses to ~N/batch_size calls.  For multi-tenant or multi-host serving
put a real frontend in front — this is the single-chip worker.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_body(handler: BaseHTTPRequestHandler) -> bytes:
    length = int(handler.headers.get("Content-Length", 0))
    return handler.rfile.read(length)


def _parse_images(handler: BaseHTTPRequestHandler) -> np.ndarray:
    body = _read_body(handler)
    ctype = handler.headers.get("Content-Type", "application/json")
    if "x-npy" in ctype:
        arr = np.load(io.BytesIO(body), allow_pickle=False)
    else:
        arr = np.asarray(json.loads(body.decode())["images"])
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
    if arr.ndim == 3:
        arr = arr[..., None]
    if arr.ndim != 4:
        raise ValueError(f"expected (N,H,W[,1]) images, got {arr.shape}")
    return arr


def _embed_texts_from_request(session, embed_texts,
                              handler: BaseHTTPRequestHandler):
    payload = json.loads(_read_body(handler).decode())
    if "texts" in payload:
        if session.text_model is None:
            raise RuntimeError("no text model loaded (pass bert_config)")
        return embed_texts(*session.featurize_reports(list(payload["texts"])))
    ids = np.asarray(payload["input_ids"], np.int32)
    masks = np.asarray(payload["attention_mask"], np.int32)
    segs = np.asarray(payload.get("token_type_ids",
                                  np.zeros_like(ids).tolist()), np.int32)
    return embed_texts(ids, masks, segs)


def make_handler(session, dynamic_batching: bool = False,
                 batch_wait_ms: float = 5.0):
    """``dynamic_batching``: route the three entry points through
    mimm_tpu.serve.DynamicBatcher — concurrent requests coalesce into
    full-batch device calls (see the class docstring)."""
    embed_images = session.embed_images
    embed_texts = session.embed_texts
    classify = session.classify
    if dynamic_batching:
        from mimm_tpu.serve import DynamicBatcher
        embed_images = DynamicBatcher(session.embed_images,
                                      session.batch_size, batch_wait_ms).submit
        classify = DynamicBatcher(session.classify, session.batch_size,
                                  batch_wait_ms).submit \
            if session.classifier is not None else session.classify
        embed_texts = DynamicBatcher(session.embed_texts, session.batch_size,
                                     batch_wait_ms).submit \
            if session.text_model is not None else session.embed_texts
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "batch_size": session.batch_size,
                    "classifier": session.classifier is not None,
                    "text_model": session.text_model is not None,
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                if self.path == "/embed_images":
                    emb = embed_images(_parse_images(self))
                    self._send(200, {"embeddings": np.asarray(emb).tolist()})
                elif self.path == "/embed_texts":
                    emb = _embed_texts_from_request(session, embed_texts, self)
                    self._send(200, {"embeddings": np.asarray(emb).tolist()})
                elif self.path == "/classify":
                    probs = classify(_parse_images(self))
                    self._send(200,
                               {"probabilities": np.asarray(probs).tolist()})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except RuntimeError as e:  # e.g. classify without a classifier
                self._send(400, {"error": str(e)})
            except Exception as e:  # malformed payloads
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def build_server(save_directory: str, port: int = 8321,
                 batch_size: int = 64, disease: str = None,
                 classifier_layers=None,
                 host: str = "127.0.0.1",
                 compute_dtype: str = "float32",
                 weight_dtype: str = "float32",
                 bert_pretrained_dir: str = None,
                 max_seq_length: int = 320,
                 dynamic_batching: bool = False,
                 batch_wait_ms: float = 5.0) -> ThreadingHTTPServer:
    from mimm_tpu.serve import InferenceSession

    if disease and classifier_layers is None:
        from mimm_tpu.config import DEFAULT_CLASSIFIER_LAYERS
        classifier_layers = list(DEFAULT_CLASSIFIER_LAYERS)
    # text serving: the bert config is read from --bert_pretrained_dir,
    # falling back to the config.json the MI trainer writes next to the
    # joint checkpoint (reference save_pretrained parity, model.py:584);
    # raw-text requests additionally need vocab.txt in bert_pretrained_dir
    bert_config = None
    vocab_dir = None
    for d, name in ((bert_pretrained_dir, "bert_config.json"),
                    (bert_pretrained_dir, "config.json"),
                    (save_directory, "config.json")):
        if d and os.path.exists(os.path.join(d, name)):
            from mimm_tpu.models.bert import BertConfig
            bert_config = BertConfig.from_json_file(os.path.join(d, name))
            break
    if not os.path.exists(os.path.join(save_directory,
                                       "pytorch_MI_text_model.bin")):
        bert_config = None  # image-only checkpoint dir (e.g. pod runs
        # export .bins offline); /healthz reports text_model: false
    if bert_pretrained_dir and \
            os.path.exists(os.path.join(bert_pretrained_dir, "vocab.txt")):
        vocab_dir = bert_pretrained_dir
    session = InferenceSession(save_directory, batch_size=batch_size,
                               bert_config=bert_config,
                               classifier_layers=classifier_layers,
                               disease=disease,
                               compute_dtype=compute_dtype,
                               weight_dtype=weight_dtype,
                               vocab_dir=vocab_dir,
                               max_seq_length=max_seq_length)
    return ThreadingHTTPServer((host, port),
                               make_handler(session,
                                            dynamic_batching=dynamic_batching,
                                            batch_wait_ms=batch_wait_ms))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_directory", required=True)
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--disease", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--weight_dtype", default="float32",
                   choices=["float32", "int8"],
                   help="int8 = weight-only PTQ (see mimm_tpu/serve.py "
                        "for the quality tests + measurement caveat)")
    p.add_argument("--bert_pretrained_dir", default=None,
                   help="bert config + vocab.txt source for /embed_texts "
                        "(config falls back to save_directory/config.json)")
    p.add_argument("--max_seq_length", type=int, default=320)
    p.add_argument("--dynamic_batching",
                   type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=False,
                   help="coalesce concurrent requests into full-batch "
                        "device calls (mimm_tpu.serve.DynamicBatcher)")
    p.add_argument("--batch_wait_ms", type=float, default=5.0,
                   help="dynamic batching: wait this long after the first "
                        "request for a batch to accumulate")
    args = p.parse_args()

    server = build_server(args.save_directory, port=args.port,
                          batch_size=args.batch_size, disease=args.disease,
                          host=args.host, compute_dtype=args.compute_dtype,
                          weight_dtype=args.weight_dtype,
                          bert_pretrained_dir=args.bert_pretrained_dir,
                          max_seq_length=args.max_seq_length,
                          dynamic_batching=args.dynamic_batching,
                          batch_wait_ms=args.batch_wait_ms)
    print(json.dumps({"serving": f"http://{args.host}:{server.server_port}",
                      "save_directory": args.save_directory}))
    server.serve_forever()


if __name__ == "__main__":
    main()
