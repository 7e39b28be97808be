#!/bin/sh
# Build the native IO helpers. Produces volq/native/libfastpng.so.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libfastpng.so fastpng.cc -lz
echo "built $(pwd)/libfastpng.so"
