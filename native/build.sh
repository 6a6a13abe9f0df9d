#!/usr/bin/env bash
# Build the native host-ingest library. No external dependencies.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 range_image.cpp lzf.cpp -o liblidarslam_native.so
echo "built $(pwd)/liblidarslam_native.so"
