"""Run the three opt-in slow gates and record their verdicts as an
artifact (VERDICT r3 item 9: "green" claims must be artifacts, not
commit-message memories).

Gates (all CPU-mesh / multi-process; none need the TPU):
  1. MIMM_RUN_PRODSHAPE=1       tests/test_prodshape_parity.py
       bert-base + 256px, fp32, 40 full MI optimizer steps vs the torch
       oracle inside a measured noise band (~20 min on a 1-core box).
  2. MIMM_RUN_PRODSHAPE_MESH=1  tests/test_prodshape_mesh.py
       full bert-base MI step on the 8-virtual-device CPU mesh in three
       lanes: dp4xtp2+SP, dp4xpp2+ZeRO-1, dp8 ZeRO-1+FSDP+bf16-allreduce.
  3. MIMM_RUN_MULTIHOST=1       tests/test_multihost_smoke.py
       real 2-process jax.distributed execution smoke.

Appends one JSON record per gate to artifacts/gates.jsonl (timestamped,
with wall time and the pytest tail), so every round's gate status is an
in-repo artifact.

Usage: python tools/run_gates.py [--only prodshape|mesh|multihost]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = {
    "prodshape": ("MIMM_RUN_PRODSHAPE", "tests/test_prodshape_parity.py"),
    "mesh": ("MIMM_RUN_PRODSHAPE_MESH", "tests/test_prodshape_mesh.py"),
    "multihost": ("MIMM_RUN_MULTIHOST", "tests/test_multihost_smoke.py"),
}


def run_gate(name, env_var, test_file, timeout):
    env = dict(os.environ, **{env_var: "1"})
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", test_file, "-x", "-q"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout)
        rc, out = proc.returncode, proc.stdout
    except subprocess.TimeoutExpired as e:
        rc, out = -1, (e.stdout or b"").decode("utf-8", "replace") \
            + f"\nTIMEOUT after {timeout}s"
    wall = time.time() - t0
    tail = [ln for ln in out.strip().splitlines() if ln.strip()][-3:]
    rec = {
        "gate": name, "test": test_file,
        "date": datetime.datetime.now().strftime("%Y-%m-%d %H:%M"),
        "passed": rc == 0, "returncode": rc,
        "wall_seconds": round(wall, 1), "pytest_tail": tail,
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(GATES), default=None)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-gate timeout in seconds")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "gates.jsonl"))
    args = ap.parse_args()

    names = [args.only] if args.only else list(GATES)
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    ok = True
    with open(args.out, "a") as f:
        for name in names:
            env_var, test_file = GATES[name]
            rec = run_gate(name, env_var, test_file, args.timeout)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            ok = ok and rec["passed"]
    print(f"gate records appended to {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
