"""Serving-path throughput: InferenceSession.embed_images / classify.

The reference has no serving story (SURVEY.md §0); mimm_tpu.serve wraps
trained checkpoints in jitted fixed-batch entry points.  This bench
measures sustained throughput of those entry points INCLUDING the
host->device transfer each request pays (that is the serving contract;
training hides transfers behind prefetch, serving cannot).

    python tools/bench_serve.py --save_directory /tmp/e2e_fixture/save_dir/mm_dv_epoch1

Prints one JSON line with imgs/s for embedding and (if a classifier
checkpoint is present) classification.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
REQUESTS = 20


def timed(fn, images):
    fn(images[:BATCH])  # compile + warm
    t0 = time.perf_counter()
    out = [fn(images) for _ in range(REQUESTS)]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in out)
    return REQUESTS * images.shape[0] / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_directory", required=True)
    p.add_argument("--disease", default=None,
                   help="load pytorch_image_classifier_<disease>*.bin and "
                        "bench classify() too")
    p.add_argument("--img_size", type=int, default=256)
    args = p.parse_args()

    from mimm_tpu.serve import InferenceSession

    from mimm_tpu.config import DEFAULT_CLASSIFIER_LAYERS
    layers = list(DEFAULT_CLASSIFIER_LAYERS) if args.disease else None
    session = InferenceSession(args.save_directory, batch_size=BATCH,
                               classifier_layers=layers, disease=args.disease)
    rng = np.random.default_rng(0)
    images = rng.random((BATCH * 4, args.img_size, args.img_size, 1),
                        np.float32)

    result = {"metric": "serve_embed_images_per_sec",
              "value": round(timed(session.embed_images, images), 2),
              "unit": "imgs/s", "batch": BATCH}
    if args.disease:
        result["classify_imgs_per_sec"] = round(
            timed(session.classify, images), 2)
    print(json.dumps(result), flush=True)

    # ---- weight-only int8 + small-batch latency lanes -------------------
    # Small-batch serving streams the whole weight set from HBM per
    # request, so weight_dtype="int8" is the lever that matters there; the
    # BERT tower (109 M params) should show it most, the conv tower (6 M)
    # least.  B=1 lanes report per-request latency.
    bc = None
    cfg_path = os.path.join(args.save_directory, "config.json")
    txt_path = os.path.join(args.save_directory, "pytorch_MI_text_model.bin")
    if os.path.exists(cfg_path) and os.path.exists(txt_path):
        from mimm_tpu.models.bert import BertConfig
        bc = BertConfig.from_json_file(cfg_path)
        L = min(320, bc.max_position_embeddings)
        ids = rng.integers(0, bc.vocab_size, (BATCH, L)).astype(np.int32)
        masks = np.ones((BATCH, L), np.int32)
        segs = np.zeros((BATCH, L), np.int32)

    lanes = {}
    for wd in ("float32", "int8"):
        for bs in (BATCH, 1):
            sess = InferenceSession(args.save_directory, batch_size=bs,
                                    bert_config=bc, weight_dtype=wd)
            tag = f"{wd}_b{bs}"
            imgs = images[:max(bs, 1)]
            sess.embed_images(imgs)  # compile + warm
            t0 = time.perf_counter()
            for _ in range(REQUESTS):
                sess.embed_images(imgs)
            lanes[f"embed_img_{tag}_ms"] = round(
                (time.perf_counter() - t0) / REQUESTS * 1e3, 2)
            if bc is not None:
                targs = (ids[:bs], masks[:bs], segs[:bs])
                sess.embed_texts(*targs)
                t0 = time.perf_counter()
                for _ in range(REQUESTS):
                    sess.embed_texts(*targs)
                lanes[f"embed_txt_{tag}_ms"] = round(
                    (time.perf_counter() - t0) / REQUESTS * 1e3, 2)
            del sess
    print(json.dumps({"int8_latency_lanes": lanes,
                      "note": "per-request ms incl. host->device transfer; "
                              "b1 = single-sample latency"}))


if __name__ == "__main__":
    main()
