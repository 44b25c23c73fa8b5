#!/bin/bash
# Build the native host-crypto runtime -> icicle_tpu/utils/libicicle_host.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -fPIC -shared -std=c++17 native/host_crypto.cpp \
    -o icicle_tpu/utils/libicicle_host.so
echo "built icicle_tpu/utils/libicicle_host.so"
