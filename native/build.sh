#!/bin/bash
# Build the native episode-transform library.
# Output: native/libfss_native.so (loaded via ctypes; optional at runtime —
# the Python data layer falls back to numpy/cv2 when absent).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -march=native -o libfss_native.so fss_native.cpp
echo "built $(pwd)/libfss_native.so"
