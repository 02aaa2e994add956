#!/bin/bash
# Follow-up to regen_tpu_resume.sh: wait for the in-flight chain (pid $1),
# re-run the two a2m eval stages that crashed on the drop_last empty-eval
# bug (fixed in 8eec00c — eval now pads the trailing partial batch), then
# start the CPU regen half (regen_cpu.sh).
set -u
cd "$(dirname "$0")/.."
LOG=scripts/regen_followup.log
: > "$LOG"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID $(date -u +%H:%M:%S)" | tee -a "$LOG"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID gone $(date -u +%H:%M:%S)" | tee -a "$LOG"
fi

run() {
    echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# a2m eval contrast, trained vs random init (previously rc=1: the 60-sample
# synthetic test split was smaller than TEST.BATCH_SIZE=64 and eval yielded
# zero batches)
run 2400 python test.py --cfg configs/config_mld_humanact12.yaml --replication_times 2 \
    --checkpoint experiments/mld/s2_humanact12/checkpoints/latest \
    TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru
run 1800 python test.py --cfg configs/config_mld_humanact12.yaml --replication_times 1 \
    TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru

echo "a2m redo done $(date -u)" | tee -a "$LOG"
bash scripts/regen_cpu.sh
echo "followup done $(date -u)" | tee -a "$LOG"
