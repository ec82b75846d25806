#!/bin/sh
# Build the mimm_host native library. No external dependencies.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libmimm_host.so mimm_host.cpp
echo "built $(pwd)/libmimm_host.so"
