#!/bin/sh
# Build the native IO library. Requires libpng/libjpeg/zlib dev packages.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libgdbn_io.so gdbn_io.cpp \
    -lpng -ljpeg -lz -lpthread
echo "built native/libgdbn_io.so"
