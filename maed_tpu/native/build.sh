#!/bin/sh
# Build the native clip-ops shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    clip_ops.cc -o libclip_ops.so
echo "built $(pwd)/libclip_ops.so"
