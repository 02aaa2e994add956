#!/bin/bash
# Round-5 seed-variance sweep for the ego convergence contrast (VERDICT r4
# weak #2: the 75.8-90.8 mm training spread was observed across rounds but
# never measured under a protocol). Trains config_mld_egobody.yaml stage 2
# at three fresh SEED_VALUEs against the SAME stage-1 VAE and evaluates each
# with the PROTOCOL eval seed (1234, 2 replications) — so the resulting
# spread isolates training-side variance (init PRNG + data order + relay
# h2d nondeterminism), with the eval side held fixed. Combined with the
# seed-1234 run already cited in BASELINE.md this gives a 4-point measured
# distribution for the trained side of the contrast.
#
# Idempotent: per-stage markers in scripts/regen_state/, same conventions as
# regen_r5.sh. ONE job at a time (1-core box).
set -u
cd "$(dirname "$0")/.."
LOG=scripts/seed_sweep_r5.log
STATE=scripts/regen_state
mkdir -p "$STATE"
touch "$LOG"

log() { echo "[seed_sweep] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

run() {
    echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    local rc=$?
    echo "--- rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
    return $rc
}

stage() {
    local name=$1; shift
    if [ -e "$STATE/$name" ]; then log "skip $name (done)"; return 0; fi
    if "$@"; then touch "$STATE/$name"; log "done $name"; return 0
    else log "FAILED $name"; return 1; fi
}

probe_tpu() {
    timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
" >> "$LOG" 2>&1
}

wait_tpu() {
    for i in $(seq 1 10); do
        log "TPU probe attempt $i"
        if probe_tpu; then return 0; fi
        sleep 120
    done
    return 1
}

# stage-1 VAE shared by every seed (the sweep varies ONLY stage-2 training)
s1_shared() {
    if [ ! -d experiments/mld/s1_egobody/checkpoints ]; then
        run 2400 python train.py --cfg configs/config_vae_egobody.yaml \
            --batch_size 64 --epochs 400
    fi
}

seed_chain() {
    local s=$1
    run 2400 python train.py --cfg configs/config_mld_egobody.yaml \
        --batch_size 64 --epochs 1200 NAME=s2_seedsweep_$s SEED_VALUE=$s &&
    run 2400 python test.py --cfg configs/config_mld_egobody.yaml \
        --batch_size 16 --replication_times 2 \
        --checkpoint experiments/mld/s2_seedsweep_$s/checkpoints/latest \
        NAME=s2_seedsweep_$s
}

if ! wait_tpu; then
    log "relay stayed down for the whole retry budget - aborting"
    exit 1
fi

stage sweep_s1      s1_shared
stage sweep_seed1   seed_chain 1
stage sweep_seed2   seed_chain 2
stage sweep_seed3   seed_chain 3

log "seed sweep complete"
