#!/usr/bin/env bash
# Build the native host-pipeline library (mic_tpu/data/_fast_decode.so).
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -o mic_tpu/data/_fast_decode.so native/fast_decode.cc -ljpeg
echo "built mic_tpu/data/_fast_decode.so"
