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

from ..parallel.mesh import batch_sharding, replicated
from .state import STAGE_TRAINABLE, TrainState

if TYPE_CHECKING:  # avoid a models <-> train import cycle at runtime
    from ..models.seeme import SeeMeSystem

LossFn = Callable[[Dict, Dict, jax.Array], Tuple[jnp.ndarray, Dict]]


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
) -> Tuple[TrainState, Dict]:
    """One pass over the data; returns final state and mean metrics."""
    from ..data.prefetch import prefetch_to_device

    acc: Dict[str, float] = {}
    count = 0
    t0 = time.perf_counter()
    sharding = batch_sharding(mesh) if mesh is not None else None
    for batch in prefetch_to_device(batches, size=2, sharding=sharding):
        state, terms = train_step(state, batch)
        count += 1
        for k, v in terms.items():
            acc[k] = acc.get(k, 0.0) + float(v)
    elapsed = time.perf_counter() - t0
    means = {k: v / max(count, 1) for k, v in acc.items()}
    if log_fn is not None:
        log_fn(int(state.step), means, elapsed)
    return state, means
