#!/bin/bash
# Round-4 TPU capture, part 3 — the stages still missing after the first two
# runners (roofline microbench never produced a "measured" block: attempt 1
# hit the pre-checkpointing timeout, attempt 2 died with its session).
# Run stages IN SEQUENCE (1-core box) and keep going on failure.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/relay_capture3.log
: > "$LOG"

run() {
    echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
    timeout "$1" "${@:2}" >> "$LOG" 2>&1
    echo "--- rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

echo "probe:" | tee -a "$LOG"
if ! timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
" >> "$LOG" 2>&1; then
    echo "relay still down — aborting capture" | tee -a "$LOG"
    exit 2
fi

run 7200 python scripts/ddim_roofline.py --resume
run 3600 python - <<'EOF'
# batch-64 chunked PointNet: compile+run wall time (expect ~batch-16 compile,
# not the 20-40 min (64, 50)-grid compile — BASELINE.md round-4 fix)
import time

import jax
import jax.numpy as jnp
import numpy as np

from seeme_tpu.nn.pointnet import ResnetPointnet
from seeme_tpu.ops import pointnet_pallas as pp

pn = ResnetPointnet(out_dim=512, hidden_dim=512)
params = pn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)))
x = jnp.asarray(np.random.RandomState(0).randn(64, 20000, 3).astype(np.float32))
fn = jax.jit(lambda p, x: pp.pointnet_forward_pallas(p, x))  # ONE jit: a fresh
# jax.jit(lambda...) per call re-traces every time (~1 s host work/call)
t0 = time.time()
s = float(fn(params, x).sum())
print(f"batch-64 chunked PointNet compile+first-run: {time.time()-t0:.1f}s (sum {s:.3f})")
t0 = time.time()
for _ in range(5):
    s = float(fn(params, x).sum())
print(f"warm (5 calls): {(time.time()-t0)/5*1e3:.1f} ms/call")
EOF

echo "capture done $(date -u)" | tee -a "$LOG"
