#!/bin/sh
# Build the native host runtime (libtpulzfse.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -Wall -pthread \
    -o libtpulzfse.so src/tpulzfse.cpp
echo "built $(pwd)/libtpulzfse.so"
