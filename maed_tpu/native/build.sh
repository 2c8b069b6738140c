#!/bin/sh
# Build the native clip-ops shared library. Links libjpeg for the threaded
# JPEG-decode pipeline when available; falls back to a decode-free build
# (has_jpeg_decode() reports which). The output lands via an atomic rename
# so concurrent builders (e.g. freshly forked loader workers racing the
# on-demand build) never expose a partially written .so.
set -e
cd "$(dirname "$0")"
TMP="libclip_ops.so.$$.tmp"
trap 'rm -f "$TMP"' EXIT
if g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    -DHAVE_LIBJPEG clip_ops.cc -o "$TMP" -ljpeg 2>/dev/null; then
  mv -f "$TMP" libclip_ops.so
  echo "built $(pwd)/libclip_ops.so (with libjpeg)"
else
  g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
      clip_ops.cc -o "$TMP"
  mv -f "$TMP" libclip_ops.so
  echo "built $(pwd)/libclip_ops.so (no libjpeg)"
fi
