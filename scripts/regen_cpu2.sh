#!/bin/bash
# Remainder of regen_cpu.sh after the GIMO stage-2 restart: the first attempt
# ran the frozen 1024-pt scene PointNet every step on CPU (~20 s/epoch, would
# overrun its timeout before the first epoch-200 checkpoint). GIMO's
# guidance_scale is 1.0, so the frozen-scene-feature cache is valid —
# TRAIN.SCENE_CACHE=true makes the step denoiser-sized (~4 s/epoch).
set -u
cd "$(dirname "$0")/.."
LOG=scripts/regen_cpu2.log
: > "$LOG"

run() {
    echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# GIMO stage 2 + eval contrast (s1_gimo finished rc=0 in regen_cpu.log)
run 4500 python train.py --cfg configs/config_mld_gimo.yaml --cpu \
    --batch_size 16 --epochs 600 model.scene_points=1024 TRAIN.SCENE_CACHE=true
run 2400 python test.py --cfg configs/config_mld_gimo.yaml --cpu \
    --batch_size 16 --replication_times 2 model.scene_points=1024 \
    --checkpoint experiments/mld/s2_scene_interactee_gimo/checkpoints/latest
run 1800 python test.py --cfg configs/config_mld_gimo.yaml --cpu \
    --batch_size 16 --replication_times 1 model.scene_points=1024

# UESTC chain (TPU if the relay answers)
if timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
" >> "$LOG" 2>&1; then
    run 1800 python train.py --cfg configs/config_vae_uestc.yaml --batch_size 64 --epochs 400
    run 2400 python train.py --cfg configs/config_mld_uestc.yaml --batch_size 64 --epochs 1500
    run 1200 python tools/train_evaluator.py --cfg configs/config_mld_uestc.yaml \
        --epochs 20 --out experiments/evaluators/uestc_stgcn --cpu
    run 2400 python test.py --cfg configs/config_mld_uestc.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_uestc/checkpoints/latest \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/uestc_stgcn
    run 1800 python test.py --cfg configs/config_mld_uestc.yaml --replication_times 1 \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/uestc_stgcn
else
    echo "relay down — skipping the UESTC TPU block" | tee -a "$LOG"
fi

echo "regen2 done $(date -u)" | tee -a "$LOG"
