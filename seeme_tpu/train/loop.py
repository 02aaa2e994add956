"""Jitted train/eval step factories and the epoch loop.

The TPU-native replacement for PyTorch-Lightning's Trainer + DDP
(`train.py:127-190`): one jit-compiled step function over a device mesh, batch
sharded on the ``data`` axis, parameters replicated; XLA inserts the gradient
all-reduce over ICI. No hand-written collective code — matching the reference,
which wrote none either (SURVEY.md §2.4).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from typing import TYPE_CHECKING

from ..parallel.mesh import batch_sharding, replicated, stacked_batch_sharding
from .state import STAGE_TRAINABLE, TrainState

if TYPE_CHECKING:  # avoid a models <-> train import cycle at runtime
    from ..models.seeme import SeeMeSystem

LossFn = Callable[[Dict, Dict, jax.Array], Tuple[jnp.ndarray, Dict]]


def _fetch_terms(terms: Dict) -> Dict[str, float]:
    """One device->host transfer for the whole metric dict: each scalar
    fetched separately costs a ~32 ms relay round trip on this box, so a
    5-term loss would spend 160 ms/dispatch on bookkeeping alone."""
    import numpy as np

    keys = sorted(terms)
    vals = np.asarray(jnp.stack([terms[k] for k in keys]))
    return dict(zip(keys, vals.tolist()))


def _make_step_body(
    system: "SeeMeSystem",
    stage: str,
    optimizer: optax.GradientTransformation,
    trainable_keys=None,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """The un-jitted (state, batch) -> (state, metrics) body shared by the
    single-step and scanned multi-step dispatch paths."""
    loss_fn: LossFn = system.vae_loss if stage == "vae" else system.diffusion_loss
    trainable = set(trainable_keys or STAGE_TRAINABLE.get(stage, ()))

    def step(state: TrainState, batch: Dict):
        rng, step_rng = jax.random.split(state.rng)

        def compute(params):
            # Frozen subtrees match the reference's requires_grad=False
            # (`mld.py:206-207, 267-271`). XLA already dead-code-eliminates
            # their backward (optax.set_to_zero discards those grads —
            # verified: step time is identical either way); stop_gradient
            # makes the freeze explicit at the loss boundary rather than an
            # emergent property of the optimizer mask.
            params = {
                k: (v if k in trainable else jax.lax.stop_gradient(v))
                for k, v in params.items()
            }
            loss, terms = loss_fn(params, batch, step_rng)
            return loss, terms

        (loss, terms), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, terms

    return step


def make_train_step(
    system: "SeeMeSystem",
    stage: str,
    optimizer: optax.GradientTransformation,
    mesh=None,
    trainable_keys=None,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Build the jitted (state, batch) -> (state, metrics) step for a stage.

    `trainable_keys` must match the set given to `make_optimizer` (both
    default to STAGE_TRAINABLE[stage]) — the stop_gradient freeze here and
    the optimizer's multi_transform mask are the same mechanism expressed
    twice and silently diverging would zero grads the optimizer thinks it
    trains."""
    step = _make_step_body(system, stage, optimizer, trainable_keys)

    if mesh is None:
        return jax.jit(step, donate_argnums=0)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_scan_train_step(
    system: "SeeMeSystem",
    stage: str,
    optimizer: optax.GradientTransformation,
    mesh=None,
    trainable_keys=None,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """k-step dispatch: one jitted call runs a `lax.scan` of the train step
    over a stack of k batches ([k, B, ...] leaves) and returns per-term means.

    Each device->host round trip on this box pays a ~32 ms relay cost and
    grows host RSS (BASELINE.md "Known issue"), so dispatching one step at a
    time leaves a 1 ms on-chip step 30x relay-bound; scanning k steps per
    dispatch amortizes both by k. Step semantics are bit-identical to k
    single dispatches (same RNG threading, same optimizer-count schedule —
    `tests/test_end_to_end.py::test_scan_dispatch_matches_single_steps`)."""
    step = _make_step_body(system, stage, optimizer, trainable_keys)

    def multi(state: TrainState, batches: Dict):
        state, terms = jax.lax.scan(step, state, batches)
        return state, {k: jnp.mean(v) for k, v in terms.items()}

    if mesh is None:
        return jax.jit(multi, donate_argnums=0)

    rep = replicated(mesh)
    sbsh = stacked_batch_sharding(mesh)
    return jax.jit(
        multi,
        in_shardings=(rep, sbsh),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_gather_scan_train_step(
    system: "SeeMeSystem",
    stage: str,
    optimizer: optax.GradientTransformation,
    mesh=None,
    trainable_keys=None,
):
    """Device-resident-data dispatch: (state, data, idx[k, B]) -> scanned
    k train steps, minibatches gathered ON DEVICE from the full split.

    The axon relay leaks host RSS byte-for-byte on every host->device
    transfer and moves ~21 MB/s (scripts/DISPATCH_PROBE.json "h2d"), so
    shipping a fresh ~5 MB batch per step both leaks ~5 MB/step and costs
    more wall time than the 1 ms cached stage-2 step itself. With the whole
    train split resident in HBM (EgoBody-scale splits are far below the 16
    GB of a v5e), the per-dispatch upload is k*B int32 indices — a few KB.
    Same step semantics as `make_scan_train_step`
    (`tests/test_end_to_end.py::test_device_data_epoch_matches_host_batches`)."""
    step = _make_step_body(system, stage, optimizer, trainable_keys)

    def multi(state: TrainState, data: Dict, idx):
        def body(st, sel):
            batch = {k: jnp.take(v, sel, axis=0) for k, v in data.items()}
            return step(st, batch)

        state, terms = jax.lax.scan(body, state, idx)
        return state, {k: jnp.mean(v) for k, v in terms.items()}

    if mesh is None:
        return jax.jit(multi, donate_argnums=0)

    rep = replicated(mesh)
    return jax.jit(
        multi,
        in_shardings=(rep, rep, stacked_batch_sharding(mesh)),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def run_epoch_device(
    gather_step,
    state: TrainState,
    device_data: Dict,
    index_batches: Iterable,
    steps_per_dispatch: int = 8,
    mesh=None,
    log_fn: Optional[Callable[[int, Dict, float], None]] = None,
) -> Tuple[TrainState, Dict]:
    """run_epoch over device-resident data: groups the index stream into
    [k, B] stacks for `make_gather_scan_train_step`. A tail group smaller
    than k runs through the same jitted function at its own [r, B] shape
    (one extra compile the first epoch; cached thereafter)."""
    import numpy as np

    acc: Dict[str, float] = {}
    count = 0
    t0 = time.perf_counter()
    k = max(int(steps_per_dispatch), 1)
    sharding = stacked_batch_sharding(mesh) if mesh is not None else None

    def dispatch(state, sels):
        stacked = jnp.asarray(np.stack(sels))
        if sharding is not None:
            stacked = jax.device_put(stacked, sharding)
        state, terms = gather_step(state, device_data, stacked)
        n = len(sels)
        for key, v in _fetch_terms(terms).items():  # means over the group
            acc[key] = acc.get(key, 0.0) + v * n
        return state, n

    buf = []
    for sel in index_batches:
        buf.append(np.asarray(sel, np.int32))
        if len(buf) == k:
            state, n = dispatch(state, buf)
            count += n
            buf = []
    if buf:
        state, n = dispatch(state, buf)
        count += n

    elapsed = time.perf_counter() - t0
    means = {key: v / max(count, 1) for key, v in acc.items()}
    if log_fn is not None:
        log_fn(int(state.step), means, elapsed)
    return state, means


def make_eval_sample_step(system: "SeeMeSystem", mesh=None):
    """Jitted conditional-sampling step: (params, batch, rng) -> feats_rst."""

    def step(params, batch, rng):
        return system.sample(params, batch, rng)

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, bsh, rep), out_shardings=bsh)


def run_epoch(
    train_step,
    state: TrainState,
    batches: Iterable[Dict],
    mesh=None,
    log_fn: Optional[Callable[[int, Dict, float], None]] = None,
    scan_step=None,
    steps_per_dispatch: int = 1,
) -> Tuple[TrainState, Dict]:
    """One pass over the data; returns final state and mean metrics.

    When `scan_step` (from `make_scan_train_step`) is given with
    `steps_per_dispatch` = k > 1, full groups of k batches are stacked on the
    host and run as one jitted k-step scan; the tail of the epoch that does
    not fill a group falls back to `train_step` one batch at a time, so every
    batch is trained on exactly once regardless of k."""
    import numpy as np

    from ..data.prefetch import prefetch_to_device

    acc: Dict[str, float] = {}
    count = 0
    t0 = time.perf_counter()
    k = int(steps_per_dispatch) if scan_step is not None else 1
    if k > 1:
        tail = []

        def grouped():
            buf = []
            for b in batches:
                buf.append(b)
                if len(buf) == k:
                    yield {
                        key: np.stack([bb[key] for bb in buf]) for key in buf[0]
                    }
                    buf = []
            tail.extend(buf)

        sharding = stacked_batch_sharding(mesh) if mesh is not None else None
        for stacked in prefetch_to_device(grouped(), size=2, sharding=sharding):
            state, terms = scan_step(state, stacked)
            count += k
            for key, v in _fetch_terms(terms).items():  # means over k steps
                acc[key] = acc.get(key, 0.0) + v * k
        remaining = iter(tail)
    else:
        remaining = iter(batches)

    sharding = batch_sharding(mesh) if mesh is not None else None
    for batch in prefetch_to_device(remaining, size=2, sharding=sharding):
        state, terms = train_step(state, batch)
        count += 1
        for key, v in _fetch_terms(terms).items():
            acc[key] = acc.get(key, 0.0) + v
    elapsed = time.perf_counter() - t0
    means = {key: v / max(count, 1) for key, v in acc.items()}
    if log_fn is not None:
        log_fn(int(state.step), means, elapsed)
    return state, means
