#!/bin/sh
# Round-5 measurement batch: every PERFORMANCE.md row, sequentially
# (one timing job on the chip at a time). Each line logs the command
# env so the table rows stay reproducible.
cd "$(dirname "$0")/.." || exit 1
run() {
  echo "=== $* ==="
  env "$@" timeout 2400 python bench.py 2>&1 \
    | grep -v -e WARNING -e "special type" | tail -1
}
# Driver-point scheduling sweep (unroll x chunk).
run BENCH_UNROLL=2 BENCH_CHUNK=8
run BENCH_UNROLL=1 BENCH_CHUNK=16
run BENCH_UNROLL=2 BENCH_CHUNK=16
# Render env-chunk width (the fused kernel may prefer wider lookup
# lanes than the pre-fusion measured-best 8).
run BENCH_RENDER_CHUNK=16
run BENCH_RENDER_CHUNK=4
# Free look.
run BENCH_LOOKY=1
# texstress: global-gated-table path vs the active-set default.
run BENCH_WAD=:texstress: BENCH_GLOBAL_MAX=16384
# Bank: config 5 at L=4, then the L=8 real-product shape.
run BENCH_BANK=1
run BENCH_BANK=1 BENCH_LEVELS=8
echo "=== fallback rate (texstress defaults) ==="
timeout 2400 python tools/fallbackrate.py 2>&1 \
  | grep -v -e WARNING -e "special type" | tail -1
