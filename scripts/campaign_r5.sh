#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 tasks 1/3/5): the full flagship
# ladder with the round-5 kernel, banded 896/1024, bf16, order-6/8/12 rows
# and the 1-device sharded anchor — strict serial, one process at a time
# (concurrent chip use was measured to contaminate timings by 40-70 %).
# All rows land in benchmark_r5.csv via --append-csv; jnp ladder rows are
# carried from benchmark_r4.csv (same backend + code path, measured r4).
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
run pallas_896  7200 $CLI --grids 896 --backends pallas
# 1024^3 f32 compiles to 21.4 G HBM (> 15.75 G): expect the documented
# graceful skip; the bf16-storage row below is how 1024^3 actually fits
run pallas_1024 7200 $CLI --grids 1024 --backends pallas
run bf16_1024  7200 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 1024 --backends pallas-bf16
# the sub-512 ladder (descending: bigger rows are worth more if time runs out)
for gs in 384 256 192 128 96 64 32; do
  run pallas_$gs 5400 $CLI --grids $gs --backends pallas
done
# mode rows: bf16 storage, order-6 sweep, order-8/12 packed engines
run bf16_512   5400 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 512 --backends pallas-bf16
run order6_512 5400 $CLI --grids 512 --backends pallas --order 6
run order8_512 5400 $CLI --grids 512 --backends pallas --order 8
run order12_512 5400 $CLI --grids 512 --backends pallas --order 12
# 1-device-mesh anchor on the real chip (shard-program overhead vs single)
run sharded_512 5400 python -m tpufdtd.harness.cli --sharded 1 --grids 512
python scripts/sort_csv.py benchmark_r5.csv
echo "=== campaign r5 done $(date +%T) ==="
