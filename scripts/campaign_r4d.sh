#!/bin/bash
# Round-4 campaign, part 4: remaining rows after the 512^3 re-measures.
# Strict serial (waits for any live harness.cli), --measure-split auto
# (pallas rows use the reference-style 85/15-class estimate — measuring
# the split costs a second ~30-45 min remote Mosaic compile per size;
# the jnp ladder rows carry the honest measured split instead).
cd /root/repo
LOG=/tmp/campaign_r4
mkdir -p $LOG
CLI="python -m tpufdtd.harness.cli --skip-correctness --append-csv --csv benchmark_r4.csv --hbm-frac 0.85"

while pgrep -f 'tpufdtd.harness.cli' > /dev/null 2>&1 && [ -z "$FORCE" ]; do
  sleep 60
done

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag $(date +%T) ---"
  timeout "$to" "$@" >> "$LOG/$tag.log" 2>&1 || echo "FAIL $tag rc=$?"
  echo "--- $tag done $(date +%T) ---"
}

run jnp_768     5400 $CLI --grids 768 --backends jnp
run pallas_896  9000 $CLI --grids 896 --backends pallas
run pallas_640  7200 $CLI --grids 640 --backends pallas
run pallas_768  7200 $CLI --grids 768 --backends pallas
for gs in 384 256 192 128 96 64 32; do
  run pallas_$gs 7200 $CLI --grids $gs --backends pallas
done
run bf16_512 9000 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 512 --backends pallas-bf16
run order6_256  7200 $CLI --grids 256 --backends pallas --order 6
run sharded_512 9000 python -m tpufdtd.harness.cli --sharded 1 --grids 512
run hetero_512  9000 python scripts/verify_hetero.py 512 5
run pallas_1024 9000 $CLI --grids 1024 --backends pallas
run bf16_256 7200 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 256 --backends pallas-bf16
echo "=== campaign part 4 done $(date +%T) ==="
