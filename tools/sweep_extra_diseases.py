"""Extend the round-5 MM-vs-UM sweep to more diseases WITHOUT re-running
pretraining: each seed's MI image model and AE encoder already exist in
the sweep workdirs (/tmp/e2e_seedN), so per extra disease only the
100-epoch best-val classifier + extended validation run per arm — the
cheap stages.  Emits rows in the mm_vs_um_seeds format and merges them
with an existing sweep artifact into a combined table covering the
reference's full disease set (BASELINE.md: Cardiomegaly, Pleural
Effusion, Edema, Pneumonia).

Usage: python tools/sweep_extra_diseases.py
           [--diseases "Cardiomegaly,Pleural Effusion"] [--seeds 5]
           [--clf_epochs 100]
           [--base artifacts/mm_vs_um_seeds_r5.json]
           [--out artifacts/mm_vs_um_seeds_r5_all.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/full_data_set"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seed(seed, diseases, clf_epochs):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MIMM_COMPILE_CACHE_DIR",
                                     "/tmp/jax_cache_e2e"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mimm_tpu import checkpoint as ckpt
    from mimm_tpu.config import TrainingConfig
    from mimm_tpu.models.resnet import ResNet256_6_2_1
    from mimm_tpu.train.ae import build_ae_model
    from mimm_tpu.train.classifier import (ClassifierModelManager,
                                           make_embedding_fn)
    from mimm_tpu.validate import validate_MultiModal, validate_UniModal

    wd = f"/tmp/e2e_seed{seed}"
    assert os.path.exists(wd + "/save/pytorch_MI_image_model.bin"), \
        f"seed {seed}: no sweep workdir at {wd} — run mm_vs_um_seeds first"
    tcfg = TrainingConfig().replace(
        image_dir=REF + "/images/",
        dataset_metadata=wd + "/training_data/training_label_negbio.csv",
        dataset_disease_stats=wd + "/training_data/disease_stats.csv",
        save_directory=wd + "/save",
        batch_size=8, decoded_crop_cache=wd + "/crop_cache",
        checkpoint_every_epochs=1_000_000, compact_transfer=True,
        seed=seed)

    model = ResNet256_6_2_1(output_channels=1)
    mm_vars = ckpt.load_resnet_from_bin(
        os.path.join(wd, "save", "pytorch_MI_image_model.bin"))
    mm_embed = make_embedding_fn("multimodal", model, mm_vars)
    ae_model = build_ae_model(tcfg)
    ae_vars = ckpt.ae_variables_from_state_dict(ckpt.load_state_dict_bin(
        os.path.join(wd, "save_um", "autoencoder_path_20.bin")))
    um_embed = make_embedding_fn("unimodal", ae_model, ae_vars)

    rows = []
    for disease in diseases:
        reports = {}
        for arm, embed, save_dir in (("mm", mm_embed, wd + "/save"),
                                     ("um", um_embed, wd + "/save_um")):
            ccfg = tcfg.replace(disease_label=disease, init_lr=5e-4,
                                save_directory=save_dir)
            mgr = ClassifierModelManager(ccfg, embed, [256, 64],
                                         val_fraction=0.2)
            cstate, best_acc, best_path = mgr.train(num_epochs=clf_epochs)
            if best_path is None:
                mgr.save(cstate, f"{disease}_epoch{clf_epochs}", True)
            validate = validate_MultiModal if arm == "mm" \
                else validate_UniModal
            kw = {} if arm == "mm" else {"ae_epoch": 20}
            reports[arm] = validate(ccfg, [256, 64], disease,
                                    extended=True, **kw)
        mm, um = reports["mm"], reports["um"]
        rows.append({
            "seed": seed, "disease": disease,
            "mm_accuracy": round(float(mm["accuracy"]), 4),
            "um_accuracy": round(float(um["accuracy"]), 4),
            "mm_gdv": float(mm["separability"]),
            "um_gdv": float(um["separability"]),
            "mm_auc": round(float(mm["auc"]), 4),
            "um_auc": round(float(um["auc"]), 4),
            "mm_confusion": {k: int(mm[k]) for k in ("tp", "tn", "fp", "fn")},
            "um_confusion": {k: int(um[k]) for k in ("tp", "tn", "fp", "fn")},
        })
        print("ROW " + json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diseases", default="Cardiomegaly,Pleural Effusion")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--clf_epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=-1,
                    help="internal: run ONE seed in-process and exit")
    ap.add_argument("--base", default=os.path.join(
        REPO, "artifacts", "mm_vs_um_seeds_r5.json"))
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "mm_vs_um_seeds_r5_all.json"))
    args = ap.parse_args()
    diseases = [d.strip() for d in args.diseases.split(",") if d.strip()]

    if args.seed >= 0:  # child mode
        run_seed(args.seed, diseases, args.clf_epochs)
        return

    import subprocess
    from mm_vs_um_seeds import is_constant_predictor, mean_std

    rows = []
    for seed in range(args.seeds):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--seed", str(seed), "--diseases", args.diseases,
             "--clf_epochs", str(args.clf_epochs)],
            capture_output=True, text=True, timeout=1800)
        seed_rows = [json.loads(l[4:]) for l in proc.stdout.splitlines()
                     if l.startswith("ROW ")]
        if proc.returncode != 0 or len(seed_rows) != len(diseases):
            print(f"seed {seed} FAILED rc={proc.returncode}\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        for r in seed_rows:
            r["mm_constant_predictor"] = is_constant_predictor(
                r["mm_confusion"])
            r["um_constant_predictor"] = is_constant_predictor(
                r["um_confusion"])
            rows.append(r)
            print(f"seed {r['seed']} {r['disease']}: "
                  f"mm={r['mm_accuracy']:.4f} um={r['um_accuracy']:.4f} "
                  f"delta={r['mm_accuracy'] - r['um_accuracy']:+.4f} "
                  f"gdv {r['mm_gdv']:.3e} vs {r['um_gdv']:.3e}"
                  + (" [MM CONST]" if r["mm_constant_predictor"] else "")
                  + (" [UM CONST]" if r["um_constant_predictor"] else ""),
                  flush=True)

    base = json.load(open(args.base))
    all_rows = base["seeds"] + rows
    all_diseases = base["diseases"] + diseases
    per_disease = dict(base["per_disease"])
    for disease in diseases:
        drows = [r for r in all_rows if r["disease"] == disease]
        deltas = [r["mm_accuracy"] - r["um_accuracy"] for r in drows]
        dmean, dstd = mean_std(deltas)
        mm_mean, mm_std = mean_std([r["mm_accuracy"] for r in drows])
        um_mean, um_std = mean_std([r["um_accuracy"] for r in drows])
        per_disease[disease] = {
            "mm_wins": sum(1 for d in deltas if d > 0),
            "ties": sum(1 for d in deltas if d == 0),
            "losses": sum(1 for d in deltas if d < 0),
            "degenerate_ties": sum(
                1 for r in drows
                if r["mm_accuracy"] == r["um_accuracy"]
                and (r["mm_constant_predictor"] or
                     r["um_constant_predictor"])),
            "gdv_mm_wins": sum(1 for r in drows
                               if r["mm_gdv"] > r["um_gdv"]),
            "mm_accuracy_mean_std": [mm_mean, mm_std],
            "um_accuracy_mean_std": [um_mean, um_std],
            "delta_mean_std": [dmean, dstd],
        }
    combined = dict(base, diseases=all_diseases, seeds=all_rows,
                    per_disease=per_disease,
                    extra_diseases_note=(
                        "Cardiomegaly/Pleural Effusion rows reuse each "
                        "seed's already-pretrained MI/AE encoders "
                        "(pretraining is disease-agnostic); classifier "
                        "and validation stages identical to the base "
                        "sweep"))
    with open(args.out, "w") as f:
        json.dump(combined, f, indent=1)
    print(json.dumps({k: v for k, v in combined.items() if k != "seeds"}))
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
