#!/bin/sh
# Build the native geometry core as a shared library (ctypes-consumed).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    -o libqedcore.so qedcore.cpp
echo "built $(pwd)/libqedcore.so"
