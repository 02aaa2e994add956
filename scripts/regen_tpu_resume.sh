#!/bin/bash
# Resume of regen_tpu.sh after the 16:19 session death: ego s1/s2 training
# already completed (checkpoints on disk) — pick up at the ego eval contrast
# and run the remaining a2m + t2m chains. See regen_tpu.sh for the full plan.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/regen_tpu_resume.log
: > "$LOG"

run() {
    echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

echo "TPU probe:" | tee -a "$LOG"
if timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
" >> "$LOG" 2>&1; then
    # ego eval contrast (s1/s2 train done 15:57-16:19, rc=0)
    run 2400 python test.py --cfg configs/config_mld_egobody.yaml --batch_size 16 --replication_times 2 \
        --checkpoint experiments/mld/s2_scene_interactee/checkpoints/latest
    run 1800 python test.py --cfg configs/config_mld_egobody.yaml --batch_size 16 --replication_times 1

    # a2m chain (VAE -> full-schedule diffusion -> native GRU evaluator -> eval contrast)
    run 1800 python train.py --cfg configs/config_vae_humanact12.yaml --batch_size 64 --epochs 400
    run 3000 python train.py --cfg configs/config_mld_humanact12.yaml --batch_size 64
    run 1200 python tools/train_evaluator.py --cfg configs/config_mld_humanact12.yaml \
        --epochs 40 --out experiments/evaluators/humanact12_gru --cpu
    run 2400 python test.py --cfg configs/config_mld_humanact12.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_humanact12/checkpoints/latest \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru
    run 1800 python test.py --cfg configs/config_mld_humanact12.yaml --replication_times 1 \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru

    # t2m chain (VAE -> diffusion -> native TM2T trio -> eval contrast)
    run 2400 python train.py --cfg configs/config_vae_humanml3d.yaml --batch_size 64 --epochs 600
    run 3000 python train.py --cfg configs/config_mld_humanml3d.yaml --batch_size 64
    run 2400 python tools/train_evaluator.py --cfg configs/config_mld_humanml3d.yaml \
        --epochs 30 --out experiments/evaluators/t2m --cpu
    run 2400 python test.py --cfg configs/config_mld_humanml3d.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_humanml3d/checkpoints/latest \
        TEST.T2M_EVALUATOR_DIR=experiments/evaluators/t2m
    run 1800 python test.py --cfg configs/config_mld_humanml3d.yaml --replication_times 1 \
        TEST.T2M_EVALUATOR_DIR=experiments/evaluators/t2m
else
    echo "relay down — not resuming the TPU block" | tee -a "$LOG"
fi

echo "tpu regen resume done $(date -u)" | tee -a "$LOG"
