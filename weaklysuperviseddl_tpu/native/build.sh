#!/bin/sh
# Build libwsdl_native.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libwsdl_native.so wsdl_native.cpp
echo "built $(pwd)/libwsdl_native.so"
