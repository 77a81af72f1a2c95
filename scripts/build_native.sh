#!/bin/sh
# Build the native plan-time kernel library.
set -e
cd "$(dirname "$0")/.."
mkdir -p petsctpu/native
g++ -O3 -fPIC -shared -std=c++17 \
    -o petsctpu/native/libpetsctpu_native.so native/petsctpu_native.cpp
echo "built petsctpu/native/libpetsctpu_native.so"
