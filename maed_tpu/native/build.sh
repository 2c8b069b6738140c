#!/bin/sh
# Build the native clip-ops shared library. Links libjpeg for the threaded
# JPEG-decode pipeline when available; falls back to a decode-free build
# (has_jpeg_decode() reports which).
set -e
cd "$(dirname "$0")"
if g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    -DHAVE_LIBJPEG clip_ops.cc -o libclip_ops.so -ljpeg 2>/dev/null; then
  echo "built $(pwd)/libclip_ops.so (with libjpeg)"
else
  g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
      clip_ops.cc -o libclip_ops.so
  echo "built $(pwd)/libclip_ops.so (no libjpeg)"
fi
