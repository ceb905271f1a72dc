#!/bin/bash
# Build the native host-kernel library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 panmap_native.cpp -o libpanmap_native.so
echo "built $(pwd)/libpanmap_native.so"
