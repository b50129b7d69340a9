#!/bin/sh
# Build the native loader core (invoked automatically on first import by
# utils/native_loader.py; safe to run by hand).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    loader_core.cpp -o libetloader.so -ljpeg -lpthread
echo "built $(pwd)/libetloader.so"
