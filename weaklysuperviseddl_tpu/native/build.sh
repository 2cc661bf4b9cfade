#!/bin/sh
# Build libwsdl_native.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o libwsdl_native.so wsdl_native.cpp wsdl_io.cpp -lz -lpthread
echo "built $(pwd)/libwsdl_native.so"
