#!/bin/bash
# Build the reference oracle tree + repo-local oracle helper binaries.
# The .oracle/ directory is gitignored and wiped between rounds; this script
# recreates everything the exactness/parity suites need:
#   .oracle/build-portable/   reference cmake build, GGML_NATIVE=OFF
#                             (the -march=native build SIGILLs in quantized
#                             vec_dot paths on this host — SKILL.md)
#   .oracle/oracle_dump_portable   raw-logit tracer    (tools/oracle/oracle_dump.cpp)
#   .oracle/oracle_full            whisper_full→TSV    (tools/oracle/oracle_full.cpp)
#   .oracle/parakeet_oracle        parakeet mel tracer (tools/oracle/parakeet_oracle.cpp)
#   .oracle/probe_filter           per-step FILTERED-logits dumper via
#                                  logits_filter_callback (tools/oracle/probe_filter.c)
#                                  — align with our params.logits_filter_callback
#                                  stream to root-cause first-divergence steps
set -euo pipefail
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
REF=/root/reference
BUILD="$REPO/.oracle/build-portable"

if [ ! -x "$BUILD/bin/whisper-cli" ]; then
  cmake -S "$REF" -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release -DGGML_NATIVE=OFF
  ninja -C "$BUILD"
fi

g++ -O2 "$REPO/tools/oracle/oracle_dump.cpp" \
    -I"$REF/include" -I"$REF/ggml/include" \
    -L"$BUILD/bin" -lwhisper -o "$REPO/.oracle/oracle_dump_portable" \
    -Wl,-rpath,"$BUILD/bin"

g++ -O2 "$REPO/tools/oracle/oracle_full.cpp" \
    -I"$REF/include" -I"$REF/ggml/include" \
    -L"$BUILD/bin" -lwhisper -o "$REPO/.oracle/oracle_full" \
    -Wl,-rpath,"$BUILD/bin"

g++ -O2 "$REPO/tools/oracle/parakeet_oracle.cpp" \
    -I"$REF/include" -I"$REF/ggml/include" \
    -L"$BUILD/bin" -lparakeet -lwhisper -o "$REPO/.oracle/parakeet_oracle" \
    -Wl,-rpath,"$BUILD/bin"

gcc -O2 "$REPO/tools/oracle/probe_filter.c" \
    -I"$REF/include" -I"$REF/ggml/include" \
    -L"$BUILD/bin" -lwhisper -o "$REPO/.oracle/probe_filter" \
    -Wl,-rpath,"$BUILD/bin"

echo "oracle ready: $BUILD/bin"
