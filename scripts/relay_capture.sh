#!/bin/bash
# Round-4 TPU measurement queue — run when the axon relay returns.
# Captures, IN SEQUENCE (1-core box: never parallel), every measurement
# this round queued behind the relay outage:
#   1. probe          — confirm the relay answers (fast fail otherwise)
#   2. ddim roofline  — loop-vs-grid kernel A/B + matmul-chain microbench
#   3. token bench    — 77-token scan vs ddim_fused_tokens
#   4. bench.py       — the north-star capture (writes one JSON line)
#   5. pointnet probe — batch-64 chunked compile-time confirmation
# Each stage logs to scripts/relay_capture.log and continues on failure so
# one flaky stage can't void the rest.
set -u
cd "$(dirname "$0")/.."
LOG=scripts/relay_capture.log
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

run 3000 python scripts/ddim_roofline.py
run 3000 python scripts/token_bench.py
run 3000 python bench.py
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
t0 = time.time()
out = jax.jit(lambda p, x: pp.pointnet_forward_pallas(p, x))(params, x)
s = float(out.sum())
print(f"batch-64 chunked PointNet compile+first-run: {time.time()-t0:.1f}s (sum {s:.3f})")
t0 = time.time()
for _ in range(5):
    s = float(jax.jit(lambda p, x: pp.pointnet_forward_pallas(p, x))(params, x).sum())
print(f"warm (5 calls): {(time.time()-t0)/5*1e3:.1f} ms/call")
EOF

echo "capture done $(date -u)" | tee -a "$LOG"
