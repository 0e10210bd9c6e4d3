#!/bin/bash
# Round-4 campaign, part 3: strict serial queue (one process on the chip at
# a time — the 512^3 jnp/pallas overlap in part 1/2 contaminated both rows
# with 40-70 % timing noise). Waits for any live harness.cli first.
# Priority: finish jnp ladder -> clean 512^3 rows (headline) -> banded 896^3
# (verdict #1b) -> 640/768 -> small ladder -> bf16/order-6/flat/sharded/hetero.
cd /root/repo
LOG=/tmp/campaign_r4
mkdir -p $LOG
CLI="python -m tpufdtd.harness.cli --skip-correctness --append-csv --csv benchmark_r4.csv --hbm-frac 0.85"

while pgrep -f 'tpufdtd.harness.cli' > /dev/null 2>&1 && [ -z "$FORCE" ]; do
  sleep 30
done

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag $(date +%T) ---"
  timeout "$to" "$@" >> "$LOG/$tag.log" 2>&1 || echo "FAIL $tag rc=$?"
  echo "--- $tag done $(date +%T) ---"
}

run pallas_512b 7200 $CLI --grids 512 --backends pallas
run jnp_768     5400 $CLI --grids 768 --backends jnp
run jnp_512b    3600 $CLI --grids 512 --backends jnp
run pallas_896  7200 $CLI --grids 896 --backends pallas
run pallas_640  7200 $CLI --grids 640 --backends pallas
run pallas_768  7200 $CLI --grids 768 --backends pallas
for gs in 384 256 192 128 96 64 32; do
  run pallas_$gs 5400 $CLI --grids $gs --backends pallas
done
run bf16_512 7200 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 512 --backends pallas-bf16
run order6_256  5400 $CLI --grids 256 --backends pallas --order 6
run flat_on_128  3600 python scripts/prof_sweep2.py 128 4 5 200 auto float32 on
run flat_off_128 3600 python scripts/prof_sweep2.py 128 4 5 200 auto float32 off
run sharded_512 7200 python -m tpufdtd.harness.cli --sharded 1 --grids 512
run hetero_512  7200 python scripts/verify_hetero.py 512 5
run bf16_256 5400 env TPUFDTD_STORAGE=bfloat16 $CLI --grids 256 --backends pallas-bf16
echo "=== campaign part 3 done $(date +%T) ==="
