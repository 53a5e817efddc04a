#!/bin/sh
# Build the native host runtime (libtpulzfse.so).
#
#   build.sh             release (-O3)
#   build.sh --sanitize  AddressSanitizer + UndefinedBehaviorSanitizer build
#   build.sh --tsan      ThreadSanitizer build (worker pools / arenas)
#
# Sanitizer builds keep the same soname so the test suite runs against them
# unchanged: build with --sanitize, run `python -m pytest tests/ -q` with
#   LD_PRELOAD=$(g++ -print-file-name=libasan.so)  (asan intercepts malloc),
# then rebuild release. The recorded clean runs live in TESTING.md
# ("Sanitizer tier").
set -e
cd "$(dirname "$0")"
case "${1:-}" in
  --sanitize)
    g++ -O1 -g -fno-omit-frame-pointer -fsanitize=address,undefined \
        -fno-sanitize-recover=all -march=native -fPIC -shared -std=c++17 \
        -Wall -pthread -o libtpulzfse.so src/tpulzfse.cpp
    echo "built $(pwd)/libtpulzfse.so [asan+ubsan]"
    ;;
  --tsan)
    g++ -O1 -g -fno-omit-frame-pointer -fsanitize=thread -march=native \
        -fPIC -shared -std=c++17 -Wall -pthread \
        -o libtpulzfse.so src/tpulzfse.cpp
    echo "built $(pwd)/libtpulzfse.so [tsan]"
    ;;
  *)
    g++ -O3 -march=native -fPIC -shared -std=c++17 -Wall -pthread \
        -o libtpulzfse.so src/tpulzfse.cpp
    echo "built $(pwd)/libtpulzfse.so"
    ;;
esac
