#!/usr/bin/env bash
# Sanitizer gate for the native codec (SURVEY.md §5 race-detection row):
# builds the C++ library with ASan+UBSan and runs the NumPy-vs-C++ fuzz
# suite against it. The coder is single-threaded per stream with a thread
# fanning out per batch element — TSan matters once the double-buffered
# pipeline shares buffers, so a TSAN=1 mode is included.
#
# Usage:  ./check_sanitized.sh [TSAN=1]
set -euo pipefail
cd "$(dirname "$0")"

SAN="address,undefined"
if [[ "${1:-}" == "TSAN=1" ]]; then SAN="thread"; fi

OUT=build/libtpc_codec_san.so
mkdir -p build
g++ -std=c++17 -O1 -g -fPIC -shared -pthread -fno-omit-frame-pointer \
    -fsanitize=${SAN} -Wall -Werror tpc_codec.cc -o "${OUT}"
echo "built ${OUT} (-fsanitize=${SAN})"

# Point the binding at the sanitized build and run the codec test suite.
# ASan must be preloaded into the python process.
ASAN_SO=$(g++ -print-file-name=libasan.so)
TSAN_SO=$(g++ -print-file-name=libtsan.so)
PRELOAD=${ASAN_SO}
if [[ "${SAN}" == "thread" ]]; then PRELOAD=${TSAN_SO}; fi

cd ../../..
LD_PRELOAD="${PRELOAD}" ASAN_OPTIONS=detect_leaks=0 \
  TPC_CODEC_SO="compression_tpu/codec/cc/${OUT##*/}" \
  TPC_CODEC_SO_PATH="compression_tpu/codec/cc/build/libtpc_codec_san.so" \
  python -m pytest tests/test_codec.py -q
echo "sanitized codec suite passed"
