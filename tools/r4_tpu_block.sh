#!/bin/bash
# Round-4 TPU work block — run once when the chip comes back
# (the axon backend was unreachable for the whole round so far).
# Order: cheapest sanity first, then the artifacts of record.
set -x
cd "$(dirname "$0")/.."

echo "=== 1. TPU gate (f32-vs-f64, now incl. virtual sites + SETTLE) ==="
timeout 2400 python tpu_gate.py > TPU_GATE_r4.md 2> /tmp/gate_err.log
echo "gate rc=$?"
tail -3 TPU_GATE_r4.md

echo "=== 2. frozen eq state for the rigid-water bench config ==="
timeout 3000 python tools/gen_eq_states.py tip3p30k 2>&1 | tail -3

echo "=== 3. headline-only bench sanity ==="
BENCH_HEADLINE_ONLY=1 BENCH_DEADLINE_S=1500 timeout 1600 python bench.py \
    2> /tmp/bench_headline.log
echo "headline rc=$?"
tail -2 /tmp/bench_headline.log

echo "=== 4. full bench ==="
timeout 3500 python bench.py > /tmp/bench_full.json 2> /tmp/bench_full.log
echo "full bench rc=$?"
cat /tmp/bench_full.json

echo "=== 5. SIN(R) ensemble validation (100 ps x 2 configs) ==="
timeout 5400 python tools/sinr_ensemble.py --ps 100 \
    > /tmp/sinr_ensemble.md 2> /tmp/sinr_ensemble.log
echo "ensemble rc=$?"
cat /tmp/sinr_ensemble.md

echo "=== 6. SIN(R) WATER ensemble validation (bench config 2b, full scale) ==="
timeout 5400 python tools/sinr_ensemble.py --system water --molecules 10000 \
    --ps 100 > /tmp/sinr_water_ensemble.md 2> /tmp/sinr_water_ensemble.log
echo "water ensemble rc=$?"
cat /tmp/sinr_water_ensemble.md
