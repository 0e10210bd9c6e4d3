#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 tasks 1/3/5): the full flagship
# ladder with the round-5 kernel, banded 896, bf16 512/1024, order-6/8/12
# rows and the 1-device sharded anchor — strict serial, one process at a
# time (concurrent chip use was measured to contaminate timings by 40-70 %).
# All rows land in benchmark_r5.csv via --append-csv; jnp ladder rows are
# carried from benchmark_r4.csv (same backend + code path, measured r4).
#
# Run scripts/precompile_r5.py for each config FIRST (concurrently is fine:
# compiles run on the remote compile server without touching the chip) —
# a cache-hit config takes ~10-20 min/row here vs ~45+ cold.
# Priority order: headline + large grids, then mode rows, then the sub-512
# ladder, then the expected-skip 1024 f32 probe.
set -u
cd /root/repo
LOG=/tmp/campaign_r5
mkdir -p $LOG
CLI="python -m tpufdtd.harness.cli --skip-correctness --append-csv --csv benchmark_r5.csv --hbm-frac 0.85"

if [ ! -f benchmark_r5.csv ]; then
  # seed with the round-4 jnp ladder (unchanged backend), sorted
  head -1 benchmark_r4.csv > benchmark_r5.csv
  grep '^jnp,' benchmark_r4.csv >> benchmark_r5.csv
  python scripts/sort_csv.py benchmark_r5.csv
fi

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag $(date +%T) ---"
  timeout "$to" "$@" >> "$LOG/$tag.log" 2>&1 || echo "FAIL $tag rc=$?"
  echo "--- $tag done $(date +%T) ---"
}

# headline + large grids first (the rows VERDICT r4 names explicitly)
run pallas_512  5400 $CLI --grids 512 --backends pallas
run pallas_640  5400 $CLI --grids 640 --backends pallas
run pallas_768  5400 $CLI --grids 768 --backends pallas
run pallas_896  5400 $CLI --grids 896 --backends pallas
# mode rows: bf16 storage (512 + the only way 1024^3 fits), order 6/8/12
run bf16_512   5400 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 512 --backends pallas-bf16
run bf16_1024  5400 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 1024 --backends pallas-bf16
run order6_512 5400 $CLI --grids 512 --backends pallas --order 6
run order12_512 5400 $CLI --grids 512 --backends pallas --order 12
# order-8's 360-step stretched span exceeds VMEM; single-span timing
run order8_512 5400 $CLI --grids 512 --backends pallas --order 8 --timing-repeat 1
# the sub-512 ladder (descending: bigger rows are worth more if time runs out)
for gs in 384 256 192 128 96 64 32; do
  run pallas_$gs 3600 $CLI --grids $gs --backends pallas
done
# 1-device-mesh anchor on the real chip (shard-program overhead vs single)
run sharded_512 5400 python -m tpufdtd.harness.cli --sharded 1 --grids 512
# expected documented skip: 1024^3 f32 compiles to 21.4G > 15.75G HBM
run pallas_1024 5400 $CLI --grids 1024 --backends pallas
python scripts/sort_csv.py benchmark_r5.csv
echo "=== campaign r5 done $(date +%T) ==="
