#!/bin/sh
# Build the native loader core (invoked automatically on first import by
# utils/native_loader.py; safe to run by hand).
#
# Atomic publish: compile to a unique temp name, then rename(2) into place —
# forked loader workers may race this script (utils/native_loader.py holds a
# cross-process flock, but a hand-run build must not expose a half-written
# .so to a concurrent dlopen either).
#
# Header/runtime match: JCS_EXT_BGR is compiled in when the BUILD headers
# are libjpeg-turbo, but the .so may dlopen against a different runtime
# libjpeg. loader_core.cpp probes the runtime once at load and falls back
# to JCS_RGB + swizzle (with a stderr warning) when EXT colorspaces are
# rejected, so a mismatch degrades, never silently fails every decode.
set -e
cd "$(dirname "$0")"
tmp="libetloader.so.tmp.$$"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    loader_core.cpp -o "$tmp" -ljpeg -lpthread
mv -f "$tmp" libetloader.so
echo "built $(pwd)/libetloader.so"
