#!/bin/sh
# Build the native setup runtime (ctypes shared library).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libwayverb_native.so \
    wayverb_native.cpp
echo "built $(pwd)/libwayverb_native.so"
