#!/bin/sh
# Driver-point scheduling sweep: tick-chain unroll x dispatch chunk.
# Unrolled tick bodies let XLA overlap tick t's render with tick t+1's
# sim step; bigger chunks amortize the ~19ms tunnel submission cost.
cd "$(dirname "$0")/.." || exit 1
for u in 1 2; do
  for c in 8 16; do
    echo "=== unroll=$u chunk=$c ==="
    BENCH_UNROLL=$u BENCH_CHUNK=$c timeout 1200 python bench.py 2>&1 \
      | grep -v -e WARNING -e "special type" | tail -1
  done
done
