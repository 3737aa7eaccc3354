#!/bin/bash
# Round-4 TPU follow-up block: artifacts that needed the lattice-aliasing
# capacity fix (8b1cf2c) — the first gate run of the round FAILED on the
# TIP4P section because the cell bucket silently overflowed at setup.
# Run after tools/r4_tpu_block.sh finishes (it owns the chip until then).
set -x
cd "$(dirname "$0")/.."

echo "=== 1. TPU gate re-run (capacity floor + loud health check) ==="
timeout 2400 python tpu_gate.py > TPU_GATE_r4.md 2> /tmp/gate2_err.log
echo "gate rc=$?"
tail -3 TPU_GATE_r4.md

echo "=== 2. graft entry self-test (entry on TPU + dryrun_multichip(8)) ==="
timeout 1200 python __graft_entry__.py > /tmp/graft_selftest.log 2>&1
echo "graft rc=$?"
tail -4 /tmp/graft_selftest.log
