"""Multi-seed MM-vs-UM stability sweep (VERDICT r2 item 9): run the full
end-to-end fixture chain (tools/e2e_fixture.py) at N seeds, where the seed
drives params/shuffle/augment AND the train/test split, and tabulate the
MM and UM held-out accuracies + GDV separability per seed.

The reference's headline claim is MM > UM by ~2-5 accuracy points on every
disease (/root/reference/save_dir/validation/{mm,um}_*.log); on the tiny
fixture corpus a single seed only shows the direction — this sweep shows
the direction's stability across seeds.

Usage: python tools/mm_vs_um_seeds.py [--seeds 5] [--epochs 2]
           [--out artifacts/mm_vs_um_seeds.json]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bert_dropout", type=float, default=0.0,
                    help="passed to e2e_fixture; 0 lets the tiny random-"
                         "init MI stage actually learn (fixture_dv_run"
                         " --bert_dropout rationale)")
    ap.add_argument("--clf_epochs", type=int, default=3)
    ap.add_argument("--disease", default="Pneumonia")
    ap.add_argument("--platform", default="",
                    help="forwarded to e2e_fixture (e.g. 'cpu')")
    ap.add_argument("--per_seed_timeout", type=int, default=3000,
                    help="seconds per e2e_fixture subprocess")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "mm_vs_um_seeds.json"))
    args = ap.parse_args()

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
                 "--disease", args.disease,
                 "--workdir", f"/tmp/e2e_seed{seed}"],
                capture_output=True, text=True,
                timeout=args.per_seed_timeout)
        except subprocess.TimeoutExpired as e:
            stderr = e.stderr or b""
            print(f"seed {seed} FAILED (timeout after {e.timeout}s):\n"
                  f"{stderr[-2000:]!r}", file=sys.stderr)
            sys.exit(1)
        result = None
        for line in proc.stdout.splitlines():
            if line.startswith("E2E_RESULT "):
                result = json.loads(line[len("E2E_RESULT "):])
        if proc.returncode != 0 or result is None:
            print(f"seed {seed} FAILED (rc={proc.returncode}):\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        rows.append(result)
        print(f"seed {seed}: mm={result['mm_accuracy']:.4f} "
              f"um={result['um_accuracy']:.4f} "
              f"delta={result['mm_accuracy'] - result['um_accuracy']:+.4f}")

    wins = sum(1 for r in rows if r["mm_accuracy"] > r["um_accuracy"])
    ties = sum(1 for r in rows if r["mm_accuracy"] == r["um_accuracy"])
    summary = {
        "disease": args.disease, "epochs": args.epochs,
        "clf_epochs": args.clf_epochs, "bert_dropout": args.bert_dropout,
        "seeds": rows,
        "mm_wins": wins, "ties": ties, "losses": len(rows) - wins - ties,
        "mean_delta": round(sum(r["mm_accuracy"] - r["um_accuracy"]
                                for r in rows) / len(rows), 4),
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
