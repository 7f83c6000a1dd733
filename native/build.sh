#!/bin/sh
# Build the native host-runtime library (threaded dataset prefetch + decode).
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread slam_io.cc -lz \
    -o build/libslam_io.so
echo "built native/build/libslam_io.so"
