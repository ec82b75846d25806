"""Format artifacts/mm_vs_um_seeds*.json as the ROUND-doc markdown table."""

import json
import sys


def main(path):
    d = json.load(open(path))
    print(f"MI/AE epochs {d['epochs']}, classifier epochs {d['clf_epochs']} "
          f"(best-val selection), bert_dropout {d['bert_dropout']}\n")
    print("| seed | disease | MM acc | UM acc | Δacc | MM GDV | UM GDV | "
          "MM AUC | UM AUC | degenerate? |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in d["seeds"]:
        deg = []
        if r.get("mm_constant_predictor"):
            deg.append("MM const")
        if r.get("um_constant_predictor"):
            deg.append("UM const")
        print(f"| {r['seed']} | {r['disease']} | {r['mm_accuracy']:.4f} | "
              f"{r['um_accuracy']:.4f} | "
              f"{r['mm_accuracy'] - r['um_accuracy']:+.4f} | "
              f"{r['mm_gdv']:.3e} | {r['um_gdv']:.3e} | "
              f"{r.get('mm_auc', float('nan')):.3f} | "
              f"{r.get('um_auc', float('nan')):.3f} | "
              f"{', '.join(deg) or '—'} |")
    print()
    for disease, s in d.get("per_disease", {}).items():
        mm, um, dd = (s["mm_accuracy_mean_std"], s["um_accuracy_mean_std"],
                      s["delta_mean_std"])
        print(f"**{disease}**: MM {mm[0]:.4f}±{mm[1]:.4f} vs UM "
              f"{um[0]:.4f}±{um[1]:.4f} (Δ {dd[0]:+.4f}±{dd[1]:.4f}); "
              f"wins/ties/losses {s['mm_wins']}/{s['ties']}/{s['losses']} "
              f"(degenerate ties: {s['degenerate_ties']}); "
              f"GDV MM>UM on {s['gdv_mm_wins']}/"
              f"{s['mm_wins'] + s['ties'] + s['losses']} seeds")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "artifacts/mm_vs_um_seeds_r5.json")
