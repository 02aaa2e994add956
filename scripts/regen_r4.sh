#!/bin/bash
# Round-4 restart: the workspace reset wiped the gitignored experiments/
# tree, so every convergence artifact BASELINE.md cites must be regenerated.
# Consolidates regen_tpu.sh + regen_cpu.sh + regen_cpu2.sh with their fixes:
#   - GIMO stage 2 runs with TRAIN.SCENE_CACHE=true (guidance 1.0, valid;
#     uncached the 1024-pt frozen PointNet overruns the CPU timeout),
#   - the a2m eval contrast runs against the padded-partial-batch eval
#     (8eec00c) so the 60-sample split is covered,
#   - the TPU relay was down at launch, so the CPU half runs FIRST and the
#     TPU half waits behind a bounded relay-retry loop.
# ONE job at a time (1-core box).
set -u
cd "$(dirname "$0")/.."
LOG=scripts/regen_r4.log
: > "$LOG"

run() {
    echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

probe_tpu() {
    timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
" >> "$LOG" 2>&1
}

# ---------------- CPU half ----------------
# stage-1 VAE for EgoBody FIRST: the wiped experiments/ tree means the image
# stage 2 below would otherwise freeze a RANDOM VAE (train.py only warns).
# CPU substitute for the TPU batch-64 protocol run; the TPU half retrains it
# at the full protocol when the relay answers.
# ~25 s/epoch on this 1-core host; 100 epochs fits the timeout with margin,
# and checkpoints must land BEFORE the timeout can fire (the default
# SACE_CHECKPOINT_EPOCH=200 would only save at the end).
run 3600 python train.py --cfg configs/config_vae_egobody.yaml --cpu \
    --batch_size 16 --epochs 100 model.scene_points=1024 \
    LOGGER.SACE_CHECKPOINT_EPOCH=50

# image-conditioned stage 2 (ResNet50 crop conditioning) + eval contrast
run 4500 python train.py --cfg configs/config_mld_egobody_image.yaml --cpu \
    --batch_size 16 --epochs 600 model.scene_points=1024 TRAIN.SCENE_CACHE=true
run 2400 python test.py --cfg configs/config_mld_egobody_image.yaml --cpu \
    --batch_size 16 --replication_times 2 model.scene_points=1024 \
    --checkpoint experiments/mld/s2_scene_interactee_image/checkpoints/latest
run 1800 python test.py --cfg configs/config_mld_egobody_image.yaml --cpu \
    --batch_size 16 --replication_times 1 model.scene_points=1024

# EgoHMR diffusion-GCN branch
run 2700 python train_egohmr.py --tiny --cpu --epochs 80 --batch_size 8 \
    --scene_points 256 --out experiments/egohmr/synthetic_convergence
run 1200 python test_egohmr.py --tiny --cpu --batch_size 8 --scene_points 256 \
    --checkpoint experiments/egohmr/synthetic_convergence/params
run 1200 python test_egohmr.py --tiny --cpu --batch_size 8 --scene_points 256

# ProHMR-scene branch
run 1800 python train_prohmr_scene.py --tiny --cpu --epochs 30 \
    --out experiments/prohmr/synthetic_convergence
run 900 python test_prohmr_scene.py --tiny --cpu \
    --checkpoint experiments/prohmr/synthetic_convergence/params
run 900 python test_prohmr_scene.py --tiny --cpu

# GIMO two-stage + eval contrast (stage 2 with the frozen-scene cache)
run 3600 python train.py --cfg configs/config_vae_gimo.yaml --cpu \
    --batch_size 16 --epochs 150 model.scene_points=1024 \
    LOGGER.SACE_CHECKPOINT_EPOCH=75
run 4500 python train.py --cfg configs/config_mld_gimo.yaml --cpu \
    --batch_size 16 --epochs 600 model.scene_points=1024 TRAIN.SCENE_CACHE=true
run 2400 python test.py --cfg configs/config_mld_gimo.yaml --cpu \
    --batch_size 16 --replication_times 2 model.scene_points=1024 \
    --checkpoint experiments/mld/s2_scene_interactee_gimo/checkpoints/latest
run 1800 python test.py --cfg configs/config_mld_gimo.yaml --cpu \
    --batch_size 16 --replication_times 1 model.scene_points=1024

echo "cpu half done $(date -u)" | tee -a "$LOG"

# ---------------- TPU half (behind a relay-retry loop) ----------------
TPU_OK=0
for i in $(seq 1 24); do          # up to ~2h of 5-min retries
    echo "TPU probe attempt $i $(date -u +%H:%M:%S)" | tee -a "$LOG"
    if probe_tpu; then TPU_OK=1; break; fi
    sleep 120
done

if [ "$TPU_OK" = 1 ]; then
    # ego two-stage + eval contrast
    run 2400 python train.py --cfg configs/config_vae_egobody.yaml --batch_size 64 --epochs 400
    run 2400 python train.py --cfg configs/config_mld_egobody.yaml --batch_size 64 --epochs 1200
    run 2400 python test.py --cfg configs/config_mld_egobody.yaml --batch_size 16 --replication_times 2 \
        --checkpoint experiments/mld/s2_scene_interactee/checkpoints/latest
    run 1800 python test.py --cfg configs/config_mld_egobody.yaml --batch_size 16 --replication_times 1

    # a2m chain
    run 1800 python train.py --cfg configs/config_vae_humanact12.yaml --batch_size 64 --epochs 400
    run 3000 python train.py --cfg configs/config_mld_humanact12.yaml --batch_size 64
    run 1200 python tools/train_evaluator.py --cfg configs/config_mld_humanact12.yaml \
        --epochs 40 --out experiments/evaluators/humanact12_gru --cpu
    run 2400 python test.py --cfg configs/config_mld_humanact12.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_humanact12/checkpoints/latest \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru
    run 1800 python test.py --cfg configs/config_mld_humanact12.yaml --replication_times 1 \
        TEST.EVALUATOR_CHECKPOINT=experiments/evaluators/humanact12_gru

    # t2m chain
    run 2400 python train.py --cfg configs/config_vae_humanml3d.yaml --batch_size 64 --epochs 600
    run 3000 python train.py --cfg configs/config_mld_humanml3d.yaml --batch_size 64
    run 2400 python tools/train_evaluator.py --cfg configs/config_mld_humanml3d.yaml \
        --epochs 30 --out experiments/evaluators/t2m --cpu
    run 2400 python test.py --cfg configs/config_mld_humanml3d.yaml --replication_times 2 \
        --checkpoint experiments/mld/s2_humanml3d/checkpoints/latest \
        TEST.T2M_EVALUATOR_DIR=experiments/evaluators/t2m
    run 1800 python test.py --cfg configs/config_mld_humanml3d.yaml --replication_times 1 \
        TEST.T2M_EVALUATOR_DIR=experiments/evaluators/t2m

    # UESTC chain
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
    echo "relay stayed down for the whole retry budget — TPU half skipped" | tee -a "$LOG"
fi

echo "regen_r4 done $(date -u)" | tee -a "$LOG"
