#!/bin/bash
# Build libicicle_tpu.so (the C ABI, include/icicle_tpu.h) and its C smoke
# test. Links the embedded CPython that hosts the JAX compute path.
set -e
cd "$(dirname "$0")/.."
mkdir -p build
PYINC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
PYLIB=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LIBDIR'))")
g++ -O2 -fPIC -shared -o build/libicicle_tpu.so native/c_api.cpp \
    -I"$PYINC" -L"$PYLIB" -lpython3.12 -Wl,-rpath,"$PYLIB"
gcc -O2 -o build/test_capi native/test_capi.c \
    -Lbuild -licicle_tpu -Wl,-rpath,'$ORIGIN'
echo "built build/libicicle_tpu.so + build/test_capi"
