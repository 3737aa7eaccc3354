#!/bin/bash
# TPU return watcher (round 4). Probes the axon chip every POLL_S seconds
# with a tiny matmul in a killable subprocess; when the probe succeeds,
# runs the queued round-4 TPU block exactly once and exits.
#
# Serial by construction: only one TPU-touching process exists at a time
# (the probe OR the block), per the axon discipline note.
POLL_S="${POLL_S:-600}"
PROBE_TIMEOUT_S="${PROBE_TIMEOUT_S:-180}"
cd "$(dirname "$0")/.."
echo "[tpu_watch] start $(date -u +%FT%TZ) poll=${POLL_S}s"
while true; do
    timeout "$PROBE_TIMEOUT_S" python - <<'EOF' >/tmp/tpu_probe.log 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("probe ok", float((x @ x).sum()), jax.devices())
EOF
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[tpu_watch] CHIP IS BACK $(date -u +%FT%TZ)"
        cat /tmp/tpu_probe.log
        bash tools/r4_tpu_block.sh > /tmp/r4_tpu_block.log 2>&1
        echo "[tpu_watch] block rc=$? done $(date -u +%FT%TZ)"
        exit 0
    fi
    echo "[tpu_watch] probe rc=$rc (down) $(date -u +%FT%TZ)"
    sleep "$POLL_S"
done
