#!/bin/sh
# Build the native host-runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -D_GNU_SOURCE \
    oipnative.cpp -o liboipnative.so
echo "built $(pwd)/liboipnative.so"
