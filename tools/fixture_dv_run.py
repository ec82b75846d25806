"""Produce the committed fixture-corpus DV-curve artifact (VERDICT r2
item 1b / r3 item 1): run the FULL MI pretraining chain (ETL ->
tokenize -> DV training) on the in-repo fixture corpus at
production-like model shape (bert-base dims over the derived vocab,
256px ResNet, L=320 reference padding, parity numerics) and commit the
loss curve under artifacts/fixture_dv_curve/.

The claim the artifact evidences: the DV training loss reproduces the
reference's curve SHAPE — monotone-trending, strongly negative, still
falling at the end (reference save_dir/mm_dv_epoch20/training_MI.log
:12-107 went -450 -> -5447 over 62.5k steps on the 200k-pair corpus).
Absolute values and step counts differ (~80 fixture pairs — the exact
count lands in summary.json — vs 200k;
derived vocab + RANDOM-INIT bert vs pretrained clinical BERT — the
real-corpus/pretrained-weights clause is environment-blocked,
PARITY.md).  Because the text tower starts from random init, the run
sets dropout 0 via --bert_dropout (reference bert_config.json surface;
see the flag help and ROUND4.md for the measured jitter-vs-spread
diagnosis that makes dropout-0 necessary and sufficient here).

Usage:  python tools/fixture_dv_run.py [--workdir /tmp/fixture_dv]
            [--epochs 1500] [--out artifacts/fixture_dv_curve]
"""

import argparse
import csv
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/full_data_set"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/fixture_dv")
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--init_lr", type=float, default=1e-4)
    ap.add_argument("--bert_dropout", type=float, default=0.0,
                    help="BERT hidden/attention dropout for the run. The "
                    "reference configures dropout via its pretrained dir's "
                    "bert_config.json, so this is reference config surface, "
                    "not a numerics change.  Default 0: at RANDOM init the "
                    "dropout-induced text-embedding jitter measures 1.4x "
                    "the inter-report embedding spread (ROUND4.md), so "
                    "with dropout on, no faithful implementation (ours or "
                    "the reference's own code) can learn MI on this corpus "
                    "-- the reference's real runs relied on pretrained "
                    "clinical-BERT weights, which are environment-blocked "
                    "(PARITY.md).")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "fixture_dv_curve"))
    ap.add_argument("--stop_epoch", type=int, default=0,
                    help="checkpoint and stop after this epoch while the "
                         "LR schedule keeps t_total=--epochs (partial "
                         "runs that --resume_from continues)")
    ap.add_argument("--resume_from", default="",
                    help="mi_epoch<N>.ckpt from a prior run with the same "
                         "--epochs; continues on the identical schedule "
                         "(warm-start knob A/Bs)")
    ap.add_argument("--knobs", default="",
                    help="comma-separated config overrides, e.g. "
                         "'gelu_tanh=1,u8_dropout=1,compute_dtype=bfloat16,"
                         "adamw_moment_dtype=bfloat16'.  gelu_tanh/"
                         "u8_dropout/flash_attention/flash_min_seq_len "
                         "route to BertConfig, the rest to TrainingConfig "
                         "(production-knob trajectory A/Bs vs the parity "
                         "default)")
    args = ap.parse_args()

    import jax
    # persistent compile cache: the f32 bert-base step at a fresh batch
    # shape costs minutes to compile through the tunnel; repeats are free
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fixture")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from e2e_fixture import build_vocab_from_corpus

    from mimm_tpu.config import DatasetConfig, TrainingConfig
    from mimm_tpu.data import etl
    from mimm_tpu.data.features import load_and_cache_examples
    from mimm_tpu.data.tokenizer import \
        NativeWordPieceTokenizer as WordPieceTokenizer
    from mimm_tpu.models.bert import BertConfig
    from mimm_tpu.train.mi import MultiModalManager

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd + "/text", exist_ok=True)

    print("[1/3] ETL on the fixture corpus")
    dcfg = DatasetConfig(
        data_dir=wd + "/data/",
        image_storage_dir=REF + "/images/",
        text_storage_dir=wd + "/text/",
        training_data_dir=wd + "/training_data/",
        training_text_dir=wd + "/training_data/text/",
        training_dataset_labeldata=wd + "/training_data/training_label_negbio.csv",
        testing_data_dir=wd + "/testing_data/",
        testing_text_dir=wd + "/testing_data/text/",
        testing_dataset_labeldata=wd + "/testing_data/testing_label_negbio.csv")
    os.makedirs(dcfg.data_dir, exist_ok=True)
    shutil.copy(REF + "/mimic-cxr-2.0.0-negbio.csv.gz", dcfg.data_dir)
    etl.synthesize_metadata_from_images(REF + "/images",
                                        dcfg.data_dir + etl.META_FILENAME)
    for sub in ("p10", "p11", "p13"):
        shutil.copytree(REF + f"/text/{sub}", wd + f"/text/{sub}")
        etl.download_full_dataset(dcfg, sub, download=False)
    os.makedirs(dcfg.training_text_dir, exist_ok=True)
    etl.populate_all_data(dcfg, ["p10", "p11", "p13"])
    etl.populate_subset_dataset(dcfg, seed=0)

    print("[2/3] tokenize (L=320 reference padding)")
    texts = [r[-1] for r in csv.reader(
        open(dcfg.training_text_dir + "/all_data.tsv"), delimiter="\t")]
    bert_dir = wd + "/bert_pretrained"
    os.makedirs(bert_dir, exist_ok=True)
    build_vocab_from_corpus(texts, bert_dir + "/vocab.txt")
    tokenizer = WordPieceTokenizer.from_pretrained(bert_dir)
    feats = load_and_cache_examples(dcfg.training_text_dir, 320, tokenizer)

    print(f"[3/3] MI pretraining: DV, {args.epochs} epochs, "
          f"bert-base dims, parity numerics"
          + (f" + knobs [{args.knobs}]" if args.knobs else ""))
    tcfg = TrainingConfig.parity().replace(
        image_dir=REF + "/images/",
        text_data_dir=dcfg.training_text_dir,
        dataset_metadata=dcfg.training_dataset_labeldata,
        save_directory=wd + "/save",
        batch_size=args.batch_size, max_seq_length=320,
        init_lr=args.init_lr,
        num_train_epochs=args.epochs, mi_estimator="dv", seed=0,
        # bit-identical decoded-crop cache (tests/test_crop_cache.py):
        # multi-hundred-epoch runs decode each image once, not per epoch
        decoded_crop_cache=wd + "/crop_cache",
        checkpoint_every_epochs=1_000_000)  # final/stop epoch only
    bert_kw = {}
    for kv in filter(None, args.knobs.split(",")):
        k, v = kv.split("=", 1)
        if k in ("gelu_tanh", "u8_dropout", "flash_attention",
                 "flash_min_seq_len"):
            bert_kw[k] = int(v) if v.isdigit() else v
            if k in ("gelu_tanh", "u8_dropout", "flash_attention"):
                bert_kw[k] = bool(int(v))
        else:
            cur = getattr(tcfg, k)
            tcfg = tcfg.replace(**{k: type(cur)(v)
                                   if not isinstance(cur, bool)
                                   else v.lower() in ("1", "true")})
    bert_cfg = BertConfig(vocab_size=tokenizer.vocab_size, num_classes=1,
                          flash_attention=False,  # bert-base dims
                          hidden_dropout_prob=args.bert_dropout,
                          attention_probs_dropout_prob=args.bert_dropout,
                          **bert_kw)
    mgr = MultiModalManager(tcfg, bert_config=bert_cfg,
                            load_pretrained_bert=False)
    mgr.train(token_features=feats, num_epochs=args.epochs,
              export_torch_bins=False,
              resume_from=args.resume_from or None,
              stop_after_epoch=args.stop_epoch or None)

    # ---- collect the artifact -------------------------------------------
    losses = []
    for line in open(os.path.join(tcfg.save_directory, "mi.jsonl")):
        rec = json.loads(line)
        if "epoch_loss" in rec:
            losses.append((rec["epoch"], rec["epoch_loss"]))
    first_epoch = losses[0][0] if losses else 1
    expected = (args.stop_epoch or args.epochs) - (first_epoch - 1)
    assert len(losses) == expected, (len(losses), expected, losses[:3])
    values = [v for _, v in losses]
    decreasing = sum(1 for a, b in zip(values, values[1:]) if b < a)
    # The reference's per-epoch points average 3125 optimizer steps
    # (200k pairs / bs 64), which is what makes its curve smooth; a
    # fixture epoch is 72//bs steps, so the comparable curve is the
    # W-epoch window mean chosen to cover a similar step count scale.
    W = 25
    windowed = [sum(values[i:i + W]) / W
                for i in range(0, len(values) - W + 1, W)]
    win_dec = sum(1 for a, b in zip(windowed, windowed[1:]) if b < a)
    print(f"epoch losses: first={values[0]:.2f} last={values[-1]:.2f} "
          f"raw decreasing transitions: {decreasing}/{len(values)-1}; "
          f"{W}-epoch window means: "
          + " ".join(f"{w:+.3f}" for w in windowed)
          + f" (decreasing {win_dec}/{len(windowed)-1})")

    os.makedirs(args.out, exist_ok=True)
    for f in ("training_MI.log", "mi.jsonl",
              "mutual_information_training.png"):
        shutil.copy(os.path.join(tcfg.save_directory, f),
                    os.path.join(args.out, f))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({
            "epochs": args.epochs, "batch_size": args.batch_size,
            "init_lr": args.init_lr, "bert_dropout": args.bert_dropout,
            "knobs": args.knobs, "stop_epoch": args.stop_epoch,
            "resumed_from": args.resume_from,
            "first_epoch": first_epoch,
            "pairs": len(feats), "vocab_size": tokenizer.vocab_size,
            "model": "bert-base dims + ResNet256_6_2_1, parity numerics",
            "epoch_losses": values,
            "decreasing_transitions": f"{decreasing}/{len(values) - 1}",
            "window_epochs": W,
            "windowed_means": [round(w, 4) for w in windowed],
            "windowed_decreasing": f"{win_dec}/{len(windowed) - 1}",
            "note": f"reference epochs average 3125 steps; fixture "
                    f"epochs are {len(feats)}//batch_size steps, so the "
                    f"windowed series is the step-count-comparable curve",
            "reference_curve": "save_dir/mm_dv_epoch20/training_MI.log "
                               "-450 -> -5447 (200k pairs)",
        }, f, indent=1)
    print(f"artifact written to {args.out}")


if __name__ == "__main__":
    main()
