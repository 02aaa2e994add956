"""Profiling / timing utilities.

The reference's observability is manual: per-sample wall clock accumulated in
`self.times` with periodic means and a `times.txt` dump
(`mld/models/modeltype/base.py:44-53`, `mld.py:389-406`), plus psutil memory
in the progress callback (`mld/callback/progress.py:52`). Kept here with the
same contracts, plus what the reference lacked: `jax.profiler` device traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import List, Optional


class StepTimer:
    """The `times.txt` contract: accumulate per-step wall clock, print batch-
    normalized means every `print_every` steps, dump one float per line."""

    def __init__(self, batch_size: int, print_every: int = 100):
        self.batch_size = batch_size
        self.print_every = print_every
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        n = len(self.times)
        if n % self.print_every == 0:
            mean = sum(self.times[-self.print_every:]) / self.print_every / self.batch_size
            print(
                f"{self.print_every} iter mean Time (batch_size: "
                f"{self.batch_size}): {mean}"
            )
        return False

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.writelines(f"{t}\n" for t in self.times)

    @property
    def seqs_per_sec(self) -> float:
        warm = self.times[1:] or self.times
        return self.batch_size / (sum(warm) / len(warm))


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace around a code region (view in TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_stats() -> dict:
    """Process RSS + device memory stats (the psutil line of
    `mld/callback/progress.py:52`, extended with device info)."""
    out = {}
    try:
        import psutil

        out["host_rss_gb"] = psutil.Process().memory_info().rss / 1e9
    except Exception:
        pass
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            out["device_gb"] = stats["bytes_in_use"] / 1e9
    except Exception:
        pass
    return out
