"""Production-knob trajectory dossier (round-3/4 VERDICT pending item):
fixture-scale DV loss curves with each production numeric knob toggled
against the parity numerics, plus the dropout-warm continuation that
hardens the round-4 dropout-0 diagnosis.

Arms (all seed 0, B=64, lr 1e-4, bert-base dims, schedule t_total=1500
epochs so every arm shares the LR schedule with the committed parity
artifact `artifacts/fixture_dv_curve/`):

1. base300        — parity numerics, dropout 0, stop at epoch 300
                    (the warm checkpoint for the dropout arms; its curve
                    must reproduce the committed artifact's first 300
                    epochs — a determinism cross-check).
2. dropout_exact  — resume base300 with dropout 0.1 (exact nn.Dropout),
                    epochs 301-900: does the descent survive the
                    regularizer once the towers are warm? (round-4
                    VERDICT weak #6)
3. dropout_u8     — same continuation with cfg.u8_dropout (the
                    production 1/256-resolution mask): the u8-dropout
                    trajectory A/B rides the same warm start.
4. gelu_tanh600   — tanh-GELU from scratch, dropout 0, epochs 1-600.
5. bf16mom600     — bf16 Adam/AdamW moment storage, epochs 1-600.
6. prod600        — full production numerics (bf16 compute + tanh GELU
                    + bf16 moments), epochs 1-600.

Arms 4-6 compare against the committed parity artifact's first 600
epochs (same seed + schedule).  Output: per-arm fixture_dv_run artifact
dirs + a combined summary JSON + overlay PNG under
artifacts/knob_trajectories/.

Usage: python tools/knob_trajectories.py [--arms base300,dropout_exact,...]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "knob_trajectories")

ARMS = {
    "base300": dict(stop=300, knobs="", dropout=0.0, resume=None),
    "dropout_exact": dict(stop=900, knobs="", dropout=0.1,
                          resume="base300"),
    "dropout_u8": dict(stop=900, knobs="u8_dropout=1", dropout=0.1,
                       resume="base300"),
    "gelu_tanh600": dict(stop=600, knobs="gelu_tanh=1", dropout=0.0,
                         resume=None),
    "bf16mom600": dict(stop=600, dropout=0.0, resume=None,
                       knobs="adamw_moment_dtype=bfloat16,"
                             "adam_moment_dtype=bfloat16"),
    "prod600": dict(stop=600, dropout=0.0, resume=None,
                    knobs="compute_dtype=bfloat16,gelu_tanh=1,"
                          "adamw_moment_dtype=bfloat16,"
                          "adam_moment_dtype=bfloat16"),
}
EPOCHS = 1500  # schedule t_total for EVERY arm (matches the committed
# parity artifact so curves are comparable epoch-for-epoch)


def run_arm(name, spec, timeout):
    wd = f"/tmp/knob_{name}"
    out = os.path.join(OUT, name)
    cmd = [sys.executable, os.path.join(REPO, "tools", "fixture_dv_run.py"),
           "--workdir", wd, "--epochs", str(EPOCHS),
           "--stop_epoch", str(spec["stop"]),
           "--bert_dropout", str(spec["dropout"]),
           "--out", out]
    if spec["knobs"]:
        cmd += ["--knobs", spec["knobs"]]
    if spec["resume"]:
        ck = f"/tmp/knob_{spec['resume']}/save/mi_epoch{ARMS[spec['resume']]['stop']}.ckpt"
        assert os.path.exists(ck), f"{name}: missing warm checkpoint {ck}"
        cmd += ["--resume_from", ck]
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, timeout=timeout, capture_output=True,
                          text=True)
    sys.stdout.write(proc.stdout[-1500:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise SystemExit(f"arm {name} failed rc={proc.returncode}")
    return json.load(open(os.path.join(out, "summary.json")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--per_arm_timeout", type=int, default=5400)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    parity = json.load(open(os.path.join(
        REPO, "artifacts", "fixture_dv_curve", "summary.json")))

    combined = {"epochs_schedule": EPOCHS,
                "parity_reference": "artifacts/fixture_dv_curve",
                "arms": {}}
    for name in args.arms.split(","):
        name = name.strip()
        s = run_arm(name, ARMS[name], args.per_arm_timeout)
        combined["arms"][name] = {
            "knobs": s["knobs"], "bert_dropout": s["bert_dropout"],
            "first_epoch": s["first_epoch"],
            "stop_epoch": s["stop_epoch"],
            "windowed_means": s["windowed_means"],
            "last_epoch_loss": s["epoch_losses"][-1],
        }
        # persist incrementally so a timeout keeps completed arms
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(combined, f, indent=1)
        print(f"--- {name} done: windowed "
              f"{s['windowed_means'][:3]} .. {s['windowed_means'][-3:]}",
              flush=True)

    # determinism cross-check: base300 must reproduce the committed
    # parity artifact's first 300 epochs (same seed/schedule/binary)
    if "base300" in combined["arms"]:
        w = combined["arms"]["base300"]["windowed_means"]
        ref = parity["windowed_means"][:len(w)]
        drift = max(abs(a - b) for a, b in zip(w, ref))
        combined["base300_vs_committed_parity_max_window_drift"] = drift
        print(f"base300 vs committed parity windowed drift: {drift:.6f}")

    # overlay plot (windowed curves, epoch-aligned)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        W = parity.get("window_epochs", 25)
        fig, ax = plt.subplots(figsize=(9, 5))
        pw = parity["windowed_means"]
        ax.plot([W * (i + 1) for i in range(len(pw))], pw,
                label="parity (committed artifact)", color="black", lw=2)
        for name, arm in combined["arms"].items():
            w = arm["windowed_means"]
            x0 = arm["first_epoch"] - 1
            ax.plot([x0 + W * (i + 1) for i in range(len(w))], w,
                    label=f"{name} ({arm['knobs'] or 'parity'}"
                          f"{', dropout ' + str(arm['bert_dropout']) if arm['bert_dropout'] else ''})")
        ax.set_xlabel("epoch (= optimizer step; 25-epoch window means)")
        ax.set_ylabel("DV loss / step")
        ax.legend(fontsize=7)
        ax.set_title("Fixture DV curves: production knobs vs parity")
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, "overlay.png"), dpi=120)
    except Exception as e:  # noqa: BLE001 — plot is best-effort
        combined["plot_error"] = repr(e)

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(combined, f, indent=1)
    print(f"dossier written to {OUT}")


if __name__ == "__main__":
    main()
