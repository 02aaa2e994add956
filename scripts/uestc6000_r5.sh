#!/bin/bash
# Round-5 follow-up: the regenerated 1500-epoch UESTC diffusion reproduces
# round 4 bit-identically but its class-conditioning contrast (0.050 vs
# 0.033 accuracy) is below the BASELINE.md variance-protocol bar. HumanAct12
# needed the full 6000-epoch schedule to learn its conditioning (accuracy
# 0.525 vs 0.050); run UESTC on the same schedule. Waits for the tail queue
# (token bench + batch sweep) to finish first — ONE job at a time.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/relay_queue_r5.log
log() { echo "[u6k] $(date -u +%H:%M:%S) $*" >> "$LOG"; }

run() {
    echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    local rc=$?
    echo "--- rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
    return $rc
}

TAIL_PID=${1:?usage: uestc6000_r5.sh <tail-queue-pid>}
log "waiting on tail queue pid $TAIL_PID"
while kill -0 "$TAIL_PID" 2>/dev/null; do sleep 60; done
log "tail queue exited - starting 6000-epoch uestc s2"

if run 4500 python train.py --cfg configs/config_mld_uestc.yaml --batch_size 64 \
        --epochs 6000 &&
   run 2400 python test.py --cfg configs/config_mld_uestc.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_uestc/checkpoints/latest \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/uestc_stgcn; then
    log "uestc 6000-epoch chain complete"
else
    log "uestc 6000-epoch chain FAILED"
fi
