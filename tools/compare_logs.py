"""Loss-trajectory comparison: our training logs vs the reference's.

The reference commits its full 20-epoch DV run under
``save_dir/mm_dv_epoch20/training_MI.log`` (BASELINE.md).  Both frameworks
emit the same 'Epoch N loss = X' line format, so parity runs can be
diffed directly:

    python tools/compare_logs.py OURS.log THEIRS.log [--plot out.png]

Prints per-epoch losses side by side with relative differences and an
overall trajectory-correlation summary.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimm_tpu.metrics import Plot_Training_From_Logfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    a = Plot_Training_From_Logfile(args.ours)
    b = Plot_Training_From_Logfile(args.theirs)
    n = min(len(a), len(b))
    if n == 0:
        print("no parsable 'Epoch N loss =' lines in one of the logs")
        return 1

    print(f"{'epoch':>5} {'ours':>14} {'reference':>14} {'rel diff':>10}")
    for i in range(n):
        denom = abs(b[i]) if b[i] != 0 else 1.0
        print(f"{i + 1:>5} {a[i]:>14.5f} {b[i]:>14.5f} "
              f"{(a[i] - b[i]) / denom:>10.2%}")

    import numpy as np
    if n >= 3:
        corr = float(np.corrcoef(a[:n], b[:n])[0, 1])
        print(f"\ntrajectory correlation over {n} epochs: {corr:.4f}")

    if args.plot:
        from mimm_tpu.metrics import Plot_Training
        Plot_Training("Epochs", "Loss", "trajectory comparison",
                      [a[:n], b[:n]], ["ours", "reference"], args.plot)
        print("plot written to", args.plot)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
