#!/bin/bash
# Round-5 continuation: the relay queue's outer `timeout 5400` was shorter
# than the uestc chain's own per-stage budgets (sum ~10200s), so the queue
# was stopped before it could SIGKILL the chain mid-eval. This script picks
# up exactly where the chain was: it waits for the already-running STGCN
# evaluator training (started by the killed regen run, now orphaned), runs
# the two uestc evals, writes the tpu_uestc stage marker, then the two
# remaining TPU jobs (token bench, batch sweep). ONE job at a time.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/relay_queue_r5.log
log() { echo "[tail] $(date -u +%H:%M:%S) $*" >> "$LOG"; }

run() {
    echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    local rc=$?
    echo "--- rc=$rc $(date -u +%H:%M:%S)" >> "$LOG"
    return $rc
}

EVAL_PID=${1:?usage: uestc_tail_r5.sh <evaluator-pid>}
log "waiting on evaluator pid $EVAL_PID"
while kill -0 "$EVAL_PID" 2>/dev/null; do sleep 30; done
log "evaluator exited"

if [ ! -e experiments/evaluators/uestc_stgcn/params ] &&
   [ -z "$(ls experiments/evaluators/uestc_stgcn 2>/dev/null)" ]; then
    log "evaluator output missing - retraining"
    run 1800 python tools/train_evaluator.py --cfg configs/config_mld_uestc.yaml \
        --epochs 20 --out experiments/evaluators/uestc_stgcn --cpu || exit 1
fi

if run 2400 python test.py --cfg configs/config_mld_uestc.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_uestc/checkpoints/latest \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/uestc_stgcn &&
   run 1800 python test.py --cfg configs/config_mld_uestc.yaml --replication_times 1 \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/uestc_stgcn; then
    touch scripts/regen_state/tpu_uestc
    log "tpu_uestc complete (marker written)"
else
    log "tpu_uestc evals FAILED"
fi

log "job 2: token_bench (packed k sweep)"
run 4500 python scripts/token_bench.py
log "token_bench rc=$?"

log "job 3: bench --sweep 64,512 (deployment row)"
run 4500 python bench.py --sweep 64,512
log "bench sweep rc=$?"
log "tail queue complete"
