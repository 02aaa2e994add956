"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices exactly as the driver's
multichip dry-run does. The axon TPU plugin forces jax_platforms='axon,cpu'
at import time, so we override it back to cpu *after* importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Tests assert numerics tightly; keep float32 matmuls exact on every backend.
jax.config.update("jax_default_matmul_precision", "highest")
