#!/bin/bash
# Round-4 measurement campaign: one process per grid size / config (long
# multi-size processes can hang the axon tunnel mid-run), serial on the one
# real chip, everything appended to benchmark_r4.csv + per-phase logs.
# Priority order: the rows the round-3 verdict flagged as missing come first
# (512-896^3 pallas), then the rest of the ladder, then jnp, then the
# bf16 / hetero / order-6 / flat-mode / sharded-anchor evidence.
cd /root/repo
LOG=/tmp/campaign_r4
mkdir -p $LOG
CLI="python -m tpufdtd.harness.cli --skip-correctness --append-csv --csv benchmark_r4.csv --hbm-frac 0.85"

echo "=== phase 1: pallas large (the missing verdict rows) ==="
for gs in 512 640 768 896; do
  echo "--- pallas $gs^3 $(date +%T) ---"
  $CLI --grids $gs --backends pallas >> $LOG/pallas_$gs.log 2>&1 || echo "FAIL pallas $gs"
done

echo "=== phase 2: pallas small/mid ==="
for gs in 32 64 96 128 192 256 384; do
  echo "--- pallas $gs^3 $(date +%T) ---"
  $CLI --grids $gs --backends pallas >> $LOG/pallas_$gs.log 2>&1 || echo "FAIL pallas $gs"
done

echo "=== phase 3: jnp ladder ==="
for gs in 32 64 96 128 192 256 384 512 640 768; do
  echo "--- jnp $gs^3 $(date +%T) ---"
  $CLI --grids $gs --backends jnp >> $LOG/jnp_$gs.log 2>&1 || echo "FAIL jnp $gs"
done

echo "=== phase 4: bf16 storage rows (method tag pallas-bf16) ==="
for gs in 128 256 512; do
  echo "--- bf16 $gs^3 $(date +%T) ---"
  TPUFDTD_STORAGE=bfloat16 $CLI --grids $gs --backends pallas-bf16 \
    >> $LOG/bf16_$gs.log 2>&1 || echo "FAIL bf16 $gs"
done

echo "=== phase 5: heterogeneous media (correctness + w-stream cost) ==="
python scripts/verify_hetero.py 512 5 > $LOG/hetero_512.log 2>&1 || echo "FAIL hetero"

echo "=== phase 6: order-6 row ==="
$CLI --grids 256 --backends pallas --order 6 >> $LOG/order6_256.log 2>&1 || echo "FAIL order6"

echo "=== phase 7: 128^3 flat on/off probe ==="
python scripts/prof_sweep2.py 128 4 5 200 auto float32 on  > $LOG/flat_on.log  2>&1 || echo "FAIL flat on"
python scripts/prof_sweep2.py 128 4 5 200 auto float32 off > $LOG/flat_off.log 2>&1 || echo "FAIL flat off"

echo "=== phase 8: sharded 1-device anchor on the real chip ==="
python -m tpufdtd.harness.cli --sharded 1 --grids 256 512 \
  > $LOG/sharded_anchor.log 2>&1 || echo "FAIL sharded anchor"

echo "=== campaign done $(date +%T) ==="
