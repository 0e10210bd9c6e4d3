#!/bin/bash
# Round-4 campaign, part 2 (after the 512^3 pallas row): remaining rows in
# verdict-priority order, one process per config, serial on the one chip.
# Trimmed vs campaign_r4.sh: the remote Mosaic compile server is running at
# ~20-30 min per fresh kernel today, so each fresh-compile config gets one
# representative size (bf16 512^3, order-6 256^3, sharded anchor 512^3).
cd /root/repo
LOG=/tmp/campaign_r4
mkdir -p $LOG
CLI="python -m tpufdtd.harness.cli --skip-correctness --append-csv --csv benchmark_r4.csv --hbm-frac 0.85"

for gs in 640 768 896; do
  echo "--- pallas $gs^3 $(date +%T) ---"
  $CLI --grids $gs --backends pallas >> $LOG/pallas_$gs.log 2>&1 || echo "FAIL pallas $gs"
done

for gs in 32 64 96 128 192 256 384; do
  echo "--- pallas $gs^3 $(date +%T) ---"
  $CLI --grids $gs --backends pallas >> $LOG/pallas_$gs.log 2>&1 || echo "FAIL pallas $gs"
done

for gs in 32 64 96 128 192 256 384 512 640; do
  echo "--- jnp $gs^3 $(date +%T) ---"
  $CLI --grids $gs --backends jnp >> $LOG/jnp_$gs.log 2>&1 || echo "FAIL jnp $gs"
done

echo "--- bf16 512^3 $(date +%T) ---"
TPUFDTD_STORAGE=bfloat16 $CLI --grids 512 --backends pallas-bf16 \
  >> $LOG/bf16_512.log 2>&1 || echo "FAIL bf16 512"

echo "--- hetero (correctness 192^3 + w-stream cost 512^3) $(date +%T) ---"
python scripts/verify_hetero.py 512 5 > $LOG/hetero_512.log 2>&1 || echo "FAIL hetero"

echo "--- order-6 256^3 $(date +%T) ---"
$CLI --grids 256 --backends pallas --order 6 >> $LOG/order6_256.log 2>&1 || echo "FAIL order6"

echo "--- 128^3 flat on/off $(date +%T) ---"
python scripts/prof_sweep2.py 128 4 5 200 auto float32 on  > $LOG/flat_on.log  2>&1 || echo "FAIL flat on"
python scripts/prof_sweep2.py 128 4 5 200 auto float32 off > $LOG/flat_off.log 2>&1 || echo "FAIL flat off"

echo "--- sharded 1-device anchor 512^3 $(date +%T) ---"
python -m tpufdtd.harness.cli --sharded 1 --grids 512 \
  > $LOG/sharded_anchor.log 2>&1 || echo "FAIL sharded anchor"

echo "--- bf16 128/256 (if time allows) $(date +%T) ---"
for gs in 256 128; do
  TPUFDTD_STORAGE=bfloat16 $CLI --grids $gs --backends pallas-bf16 \
    >> $LOG/bf16_$gs.log 2>&1 || echo "FAIL bf16 $gs"
done

echo "=== campaign part 2 done $(date +%T) ==="
