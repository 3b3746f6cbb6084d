#!/bin/sh
# Reproduce every PERFORMANCE.md row, sequentially (one timing job on
# the chip at a time). Numbers should land within ~5% of the table.
cd "$(dirname "$0")/.." || exit 1
run() {
  echo "=== $* python bench.py ==="
  env "$@" timeout 3000 python bench.py 2>&1 \
    | grep -v -e WARNING -e "special type" | tail -1
}
run                      # driver point
run BENCH_LOOKY=1        # free look
run BENCH_WAD=:texstress:  # real texel volume at shipped defaults
run BENCH_BANK=1         # config 5 (4x1024, 640x400)
run BENCH_BANK=1 BENCH_LEVELS=8  # L=8 bank (auto 2-tick chunks)
echo "=== fallback rate (texstress defaults) ==="
timeout 2500 python tools/fallbackrate.py 2>&1 \
  | grep -v -e WARNING -e "special type" | tail -1
echo "=== on-device kernel verification (6 legs) ==="
timeout 5400 python bench.py --verify 2>&1 \
  | grep -v -e WARNING -e "special type" | tail -1
