#!/bin/sh
# Build the mimm_host native library. No external dependencies.
# Writes a .buildhost ISA fingerprint next to the .so: the binary is
# -march=native, and mimm_tpu/data/native_ops.py refuses to load (and
# rebuilds) when the fingerprint doesn't match the running host — a
# foreign .so could SIGILL mid-training.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libmimm_host.so mimm_host.cpp
python3 - <<'PY'
import sys
sys.path.insert(0, "..")
from mimm_tpu.data.native_ops import _MARKER_PATH, _host_isa_id
open(_MARKER_PATH, "w").write(_host_isa_id())
print("built", _MARKER_PATH)
PY
echo "built $(pwd)/libmimm_host.so"
