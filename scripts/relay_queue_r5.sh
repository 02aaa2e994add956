#!/bin/bash
# Round-5 relay work queue: wait out the outage, then run the remaining
# TPU jobs in sequence (ONE at a time — 1-core box, relay protocol).
# Idempotent: each job writes its own artifact; regen_r5.sh has stage
# markers; token_bench/bench overwrite their JSONs.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/relay_queue_r5.log
log() { echo "[queue] $(date -u +%H:%M:%S) $*" >> "$LOG"; }

probe() {
    timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
" >> "$LOG" 2>&1
}

# up to ~3h of 5-min retries
for i in $(seq 1 36); do
    log "probe attempt $i"
    if probe; then log "relay up"; break; fi
    [ "$i" = 36 ] && { log "relay stayed down - queue aborted"; exit 1; }
    sleep 300
done

log "job 1: regen_r5 (tpu_uestc)"
# NOTE: the outer budget must exceed the chain's own per-stage budgets
# (regen_r5.sh uestc_chain sums to ~10200s) — an outer timeout shorter than
# that SIGKILLs the chain mid-stage, writes no stage marker, and can leave
# an orphaned python holding the chip while jobs 2-3 start.
timeout 10800 bash scripts/regen_r5.sh >> "$LOG" 2>&1
log "regen rc=$?"

log "job 2: token_bench (packed k sweep, VERDICT r4 #8)"
timeout 4500 python scripts/token_bench.py >> "$LOG" 2>&1
log "token_bench rc=$?"

log "job 3: bench --sweep 64,512 (deployment row, VERDICT r4 #5)"
timeout 4500 python bench.py --sweep 64,512 >> "$LOG" 2>&1
log "bench sweep rc=$?"
log "queue complete"
