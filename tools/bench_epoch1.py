"""Epoch-1 ingest wall-clock: measured, not derived (round-4 VERDICT
weak #7 / next-round item 8).

Two measurements on the shipped fixture corpus (142 full-res CXRs, the
paired loader exactly as training consumes it):

* ``--mode loader`` (host-only): one full Loader epoch under three
  ingest strategies — no crop cache (reference behavior: decode every
  epoch), cold crop cache (decode + cache-write inline during epoch 1),
  and a cache prebuilt by ``mimm-prebuild-cache``.  This isolates the
  host cost the cores-table projects (ROUND4.md item 7).
* ``--mode train``: a REAL 1-epoch MultiModalManager run (fixture
  corpus, B=8) cold vs prebuilt, reporting the epoch wall-clock from
  the manager's own log.  On this 1-core dev box the tunnel dispatch
  latency dominates the epoch, so the loader mode is the clean signal;
  the train mode shows the same delta riding a real run.

Prints one JSON object with all measured wall-clocks.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/full_data_set"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loader_epoch_seconds(crop_cache_dir, metadata, workers=0):
    from mimm_tpu.data import crop_cache as cc
    from mimm_tpu.data.pipeline import CXRImageDataset, Loader

    cache = cc.DecodedCropCache(crop_cache_dir, 256) \
        if crop_cache_dir else None
    ds = CXRImageDataset(img_dir=REF + "/images/",
                         dataset_metadata=metadata,
                         img_size=256, compact=True, crop_cache=cache)
    loader = Loader(ds, batch_size=8, seed=0, num_workers=workers)
    t0 = time.time()
    n = 0
    for batch in loader.epoch(0):
        n += batch["image"].shape[0]
    return round(time.time() - t0, 3), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="loader",
                    choices=["loader", "train", "_train_arm"])
    ap.add_argument("--workdir", default="/tmp/epoch1_bench")
    ap.add_argument("--_cache_dir", default="")
    args = ap.parse_args()

    if args.mode == "_train_arm":
        train_arm(args.workdir, getattr(args, "_cache_dir"))
        return

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd, exist_ok=True)

    # mimic_id table over every fixture image (CXRImageDataset contract:
    # a CSV whose mimic_id column holds image-relative paths)
    meta = os.path.join(wd, "all_images.csv")
    with open(meta, "w") as g:
        g.write("mimic_id\n")
        for root, _, files in os.walk(REF + "/images"):
            rel = os.path.relpath(root, REF + "/images")
            for name in sorted(files):
                if name.lower().endswith((".jpg", ".jpeg", ".png")):
                    g.write((name if rel == "."
                             else os.path.join(rel, name)) + "\n")

    out = {"corpus_images": 142, "mode": args.mode}

    if args.mode == "loader":
        import jax
        jax.config.update("jax_platforms", "cpu")
        # reference behavior: full decode every epoch, no cache
        out["no_cache_epoch_s"], out["samples"] = \
            loader_epoch_seconds(None, meta)
        # cold cache: epoch 1 decodes AND writes the cache inline
        cold = os.path.join(wd, "cache_cold")
        out["cold_cache_epoch1_s"], _ = loader_epoch_seconds(cold, meta)
        # the SAME cache is now warm == what epoch 2+ pays
        out["warm_cache_epoch_s"], _ = loader_epoch_seconds(cold, meta)
        # prebuilt path: mimm-prebuild-cache ahead of training
        pre = os.path.join(wd, "cache_pre")
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "prebuild_cache.py"),
             "--image_dir", REF + "/images", "--cache_dir", pre,
             "--workers", "1", "--report_every", "0"],
            capture_output=True, text=True)
        out["prebuild_wall_s"] = round(time.time() - t0, 3)
        out["prebuild_summary"] = json.loads(
            rc.stdout.strip().splitlines()[-1])
        out["prebuilt_epoch1_s"], _ = loader_epoch_seconds(pre, meta)
        out["epoch1_saved_s_vs_no_cache"] = round(
            out["no_cache_epoch_s"] - out["prebuilt_epoch1_s"], 3)
    else:
        # real 1-epoch training runs as separate subprocesses sharing one
        # persistent compile cache: a warm-compile pass first, so neither
        # measured arm's epoch-1 wall-clock includes the step compile
        for tag in ("warmcompile", "cold", "prebuilt"):
            cache = os.path.join(wd, f"train_cache_{tag}")
            if tag == "prebuilt":
                subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "cli", "prebuild_cache.py"),
                     "--image_dir", REF + "/images", "--cache_dir", cache,
                     "--workers", "1", "--report_every", "0"],
                    capture_output=True, text=True, check=False)
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--mode", "_train_arm", "--workdir", wd,
                 "--_cache_dir", cache],
                capture_output=True, text=True, timeout=2700)
            if rc.returncode != 0:
                out[f"train_{tag}_rc"] = rc.returncode
                out[f"train_{tag}_err"] = rc.stderr[-800:]
                continue
            if tag != "warmcompile":
                out[f"train_epoch1_{tag}_s"] = json.loads(
                    rc.stdout.strip().splitlines()[-1])["epoch_seconds"]
    print(json.dumps(out, indent=1))


def train_arm(wd, cache_dir):
    """One real 1-epoch MI run (fixture corpus, B=8, small BERT) whose
    crop cache is ``cache_dir``; prints the epoch's wall-clock."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(wd, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_fixture import build_vocab_from_corpus

    import csv
    from mimm_tpu.config import DatasetConfig, TrainingConfig
    from mimm_tpu.data import etl
    from mimm_tpu.data.features import load_and_cache_examples
    from mimm_tpu.data.tokenizer import \
        NativeWordPieceTokenizer as WordPieceTokenizer
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.train.mi import MultiModalManager

    run = os.path.join(wd, "run_" + os.path.basename(cache_dir))
    shutil.rmtree(run, ignore_errors=True)
    os.makedirs(run + "/text", exist_ok=True)
    dcfg = DatasetConfig(
        data_dir=run + "/data/", image_storage_dir=REF + "/images/",
        text_storage_dir=run + "/text/",
        training_data_dir=run + "/training_data/",
        training_text_dir=run + "/training_data/text/",
        training_dataset_labeldata=run + "/training_data/training_label_negbio.csv",
        testing_data_dir=run + "/testing_data/",
        testing_text_dir=run + "/testing_data/text/",
        testing_dataset_labeldata=run + "/testing_data/testing_label_negbio.csv")
    os.makedirs(dcfg.data_dir, exist_ok=True)
    shutil.copy(REF + "/mimic-cxr-2.0.0-negbio.csv.gz", dcfg.data_dir)
    etl.synthesize_metadata_from_images(REF + "/images",
                                        dcfg.data_dir + etl.META_FILENAME)
    for sub in ("p10", "p11", "p13"):
        shutil.copytree(REF + f"/text/{sub}", run + f"/text/{sub}")
        etl.download_full_dataset(dcfg, sub, download=False)
    os.makedirs(dcfg.training_text_dir, exist_ok=True)
    etl.populate_all_data(dcfg, ["p10", "p11", "p13"])
    etl.populate_subset_dataset(dcfg, seed=0)
    texts = [r[-1] for r in csv.reader(
        open(dcfg.training_text_dir + "/all_data.tsv"), delimiter="\t")]
    bert_dir = run + "/bert_pretrained"
    os.makedirs(bert_dir, exist_ok=True)
    build_vocab_from_corpus(texts, bert_dir + "/vocab.txt")
    tokenizer = WordPieceTokenizer.from_pretrained(bert_dir)
    feats = load_and_cache_examples(dcfg.training_text_dir, 128, tokenizer)
    tcfg = TrainingConfig().replace(
        image_dir=REF + "/images/", text_data_dir=dcfg.training_text_dir,
        dataset_metadata=dcfg.training_dataset_labeldata,
        save_directory=run + "/save", batch_size=8, max_seq_length=128,
        num_train_epochs=1, seed=0, decoded_crop_cache=cache_dir)
    bert_cfg = BertConfig(vocab_size=tokenizer.vocab_size, hidden_size=128,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=256,
                          max_position_embeddings=128, num_classes=1)
    mgr = MultiModalManager(tcfg, bert_config=bert_cfg,
                            load_pretrained_bert=False)
    mgr.train(token_features=feats, num_epochs=1, export_torch_bins=False)
    rec = [json.loads(l) for l in
           open(os.path.join(tcfg.save_directory, "mi.jsonl"))][0]
    print(json.dumps({"epoch_seconds": rec["epoch_seconds"]}))


if __name__ == "__main__":
    main()
