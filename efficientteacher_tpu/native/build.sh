#!/bin/sh
# Build the native loader core (invoked automatically on first import by
# utils/native_loader.py; safe to run by hand).
#
# Atomic publish: compile to a unique temp name, then rename(2) into place —
# forked loader workers may race this script (utils/native_loader.py holds a
# cross-process flock, but a hand-run build must not expose a half-written
# .so to a concurrent dlopen either).
set -e
cd "$(dirname "$0")"
tmp="libetloader.so.tmp.$$"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    loader_core.cpp -o "$tmp" -ljpeg -lpthread
mv -f "$tmp" libetloader.so
echo "built $(pwd)/libetloader.so"
