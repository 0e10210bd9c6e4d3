#!/bin/bash
# Round-5 strict-serial measurement queue (continuation session).
# Precondition: scripts/precompile_r5.py ran (or is running) for each config,
# so most rows are cache-hits (~2 min); a cache-miss row just compiles inline.
# One process at a time on the chip — concurrent chip use contaminates
# timings by 40-70 % (measured, round 4).
set -u
cd /root/repo
LOG=/tmp/campaign_r5
mkdir -p $LOG
CLI="python -m tpufdtd.harness.cli --skip-correctness --append-csv --csv benchmark_r5.csv --hbm-frac 0.85"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag $(date +%T) ---"
  timeout "$to" "$@" >> "$LOG/$tag.log" 2>&1 || echo "FAIL $tag rc=$?"
  echo "--- $tag done $(date +%T) ---"
}

# large grids first (the rows VERDICT r4 names explicitly), then modes,
# then the sub-512 ladder descending
run pallas_640  5400 $CLI --grids 640 --backends pallas
run pallas_768  5400 $CLI --grids 768 --backends pallas
run pallas_896  5400 $CLI --grids 896 --backends pallas
run bf16_512   5400 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 512 --backends pallas-bf16
run order6_512 5400 $CLI --grids 512 --backends pallas --order 6
for gs in 384 256 192 128 96 64 32; do
  run pallas_$gs 3600 $CLI --grids $gs --backends pallas
done
# 1-device-mesh anchor on the real chip (shard-program overhead vs single)
run sharded_512 5400 python -m tpufdtd.harness.cli --sharded 1 --grids 512
python scripts/sort_csv.py benchmark_r5.csv
echo "=== campaign r5 serial done $(date +%T) ==="
