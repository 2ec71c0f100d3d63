#!/bin/sh
# Build the native data-IO shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o libprv2io.so dataio.cpp
echo "built $(pwd)/libprv2io.so"
