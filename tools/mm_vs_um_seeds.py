"""Multi-seed, multi-disease MM-vs-UM sweep (VERDICT r2 item 9 / r4 item 1):
run the full end-to-end fixture chain (tools/e2e_fixture.py) at N seeds,
where the seed drives params/shuffle/augment AND the train/test split, and
tabulate the MM and UM held-out accuracies + GDV separability per
(seed, disease).

The reference's headline claim is MM > UM by ~2-5 accuracy points on every
disease (/root/reference/save_dir/validation/{mm,um}_*.log); on the tiny
fixture corpus a single seed only shows the direction — this sweep shows
the direction's stability across seeds and diseases.

Round-5 design (r4 verdict: the 3-classifier-epoch sweep was degenerate —
4/5 seeds tied at the constant-prediction majority plateau): classifiers
now train clf_epochs=100 with best-val selection (reference parity,
main_utils.py:526-530), the MI/AE stages run 30 epochs, and each seed's
pretraining is SHARED across the diseases.  Every row carries the
confusion tallies, so a constant-predictor (majority-class) arm is
detected mechanically rather than inferred from tied accuracies.

Usage: python tools/mm_vs_um_seeds.py [--seeds 5]
           [--diseases Pneumonia,Edema] [--epochs 30] [--clf_epochs 100]
           [--out artifacts/mm_vs_um_seeds.json]
"""

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def is_constant_predictor(conf):
    """True if the arm predicted a single class for EVERY sample (the
    degenerate majority-class plateau the round-4 sweep parked at)."""
    pred_pos = conf["tp"] + conf["fp"]
    pred_neg = conf["tn"] + conf["fn"]
    return pred_pos == 0 or pred_neg == 0


def mean_std(xs):
    m = sum(xs) / len(xs)
    var = sum((x - m) ** 2 for x in xs) / len(xs)
    return round(m, 4), round(math.sqrt(var), 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=20,
                    help="MI / AE pretraining epochs per seed (the "
                         "reference trains both arms 20 epochs)")
    ap.add_argument("--bert_dropout", type=float, default=0.0,
                    help="passed to e2e_fixture; 0 lets the tiny random-"
                         "init MI stage actually learn (fixture_dv_run"
                         " --bert_dropout rationale)")
    ap.add_argument("--clf_epochs", type=int, default=100,
                    help="classifier epochs (reference trains 100 with "
                         "best-val selection, main_utils.py:526-530)")
    ap.add_argument("--diseases", default="Pneumonia,Edema",
                    help="comma-separated; pretraining is shared per seed")
    ap.add_argument("--platform", default="",
                    help="forwarded to e2e_fixture (e.g. 'cpu')")
    ap.add_argument("--per_seed_timeout", type=int, default=3600,
                    help="seconds per e2e_fixture subprocess")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "mm_vs_um_seeds.json"))
    args = ap.parse_args()

    diseases = [d.strip() for d in args.diseases.split(",") if d.strip()]
    rows = []
    for seed in range(args.seeds):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools",
                                              "e2e_fixture.py"),
                 "--seed", str(seed), "--epochs", str(args.epochs),
                 "--clf_epochs", str(args.clf_epochs),
                 "--bert_dropout", str(args.bert_dropout),
                 *(["--platform", args.platform] if args.platform else []),
                 "--disease", ",".join(diseases),
                 "--workdir", f"/tmp/e2e_seed{seed}"],
                capture_output=True, text=True,
                timeout=args.per_seed_timeout)
        except subprocess.TimeoutExpired as e:
            stderr = e.stderr or b""
            print(f"seed {seed} FAILED (timeout after {e.timeout}s):\n"
                  f"{stderr[-2000:]!r}", file=sys.stderr)
            sys.exit(1)
        seed_rows = []
        for line in proc.stdout.splitlines():
            if line.startswith("E2E_RESULT "):
                seed_rows.append(json.loads(line[len("E2E_RESULT "):]))
        if proc.returncode != 0 or len(seed_rows) != len(diseases):
            print(f"seed {seed} FAILED (rc={proc.returncode}, "
                  f"{len(seed_rows)}/{len(diseases)} results):\n"
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

    per_disease = {}
    for disease in diseases:
        drows = [r for r in rows if r["disease"] == disease]
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
    summary = {
        "diseases": diseases, "epochs": args.epochs,
        "clf_epochs": args.clf_epochs, "bert_dropout": args.bert_dropout,
        "seeds": rows,
        "per_disease": per_disease,
        "reference": "save_dir/validation/{mm,um}_*.log (~2-5 pt MM gap)",
    }
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "seeds"}))
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
