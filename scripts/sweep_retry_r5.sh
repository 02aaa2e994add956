#!/bin/bash
# Round-5: the first bench --sweep attempt died on a transient relay d2h
# failure (FAILED_PRECONDITION fetching alphas_cumprod — since hardened:
# schedulers.py keeps a host-side copy). Re-run it once the 6000-epoch
# uestc job releases the chip; retry the sweep itself a few times since
# the relay has been flaky tonight. ONE job at a time.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/relay_queue_r5.log
log() { echo "[sweep] $(date -u +%H:%M:%S) $*" >> "$LOG"; }

U6K_PID=${1:?usage: sweep_retry_r5.sh <u6k-pid>}
log "waiting on u6k pid $U6K_PID"
while kill -0 "$U6K_PID" 2>/dev/null; do sleep 60; done
log "u6k exited - running bench --sweep 64,512"

for i in 1 2 3; do
    echo "=== $(date -u +%H:%M:%S) bench --sweep attempt $i" >> "$LOG"
    if timeout 4500 python bench.py --sweep 64,512 >> "$LOG" 2>&1; then
        log "bench sweep ok (attempt $i)"
        break
    fi
    log "bench sweep attempt $i failed (rc=$?)"
    [ "$i" = 3 ] && log "bench sweep FAILED after 3 attempts"
    sleep 120
done
log "sweep retry done"
