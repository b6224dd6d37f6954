#!/usr/bin/env bash
# Build the native tileops shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libtileops.so tileops.cpp
echo "built $(pwd)/libtileops.so"
