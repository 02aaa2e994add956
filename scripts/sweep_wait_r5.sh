#!/bin/bash
# Round-5 (final session): the relay was down at session start and the
# previous sweep attempt was cut off by the VM snapshot. Probe until the
# relay answers, then capture bench --sweep 64,512 with retries.
# ONE job at a time on this 1-core box.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/sweep_wait_r5.log
log() { echo "[sweep-wait] $(date -u +%H:%M:%S) $*" >> "$LOG"; }

log "start"
for p in $(seq 1 80); do
    if timeout 240 python -c 'import jax,jax.numpy as jnp; print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))' >> "$LOG" 2>&1; then
        log "relay up (probe $p)"
        break
    fi
    log "probe $p down; sleeping 300s"
    sleep 300
done

for i in 1 2 3 4; do
    echo "=== $(date -u +%H:%M:%S) bench --sweep attempt $i" >> "$LOG"
    if timeout 4500 python bench.py --sweep 64,512 >> "$LOG" 2>&1; then
        log "bench sweep ok (attempt $i)"
        break
    fi
    log "bench sweep attempt $i failed (rc=$?)"
    [ "$i" = 4 ] && log "bench sweep FAILED after 4 attempts"
    sleep 180
done
log "done"
