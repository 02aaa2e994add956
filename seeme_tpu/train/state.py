"""Train state and optimizer construction.

The reference uses AdamW + per-epoch StepLR (`mld.py:292-299`,
`TRAIN.OPTIM` in `configs/config_mld_egobody.yaml:39-43`: lr 1e-4,
step_size 6000 epochs, gamma 0.2). Stage-2 freezes the VAE and the perception
stack (`mld.py:185-208, 267-271`); here freezing is an optax mask over the
parameter tree, so frozen subtrees carry no optimizer state and receive no
updates — semantics identical to requires_grad=False.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import chex
import jax
import optax
from flax import struct

# Subtrees of the system parameter dict that train in each stage.
STAGE_TRAINABLE = {
    # stage 1 trains the VAE only (`STAGE: vae` configs)
    "vae": ("vae",),
    # stage 2 trains the denoiser and the condition projections; the VAE and
    # the frozen perception encoder do not update (`mld.py:267-271, 206-207`)
    "diffusion": ("denoiser", "output_scene", "output_images", "embed_action"),
}


@struct.dataclass
class TrainState:
    step: chex.Array
    params: Any
    opt_state: Any
    rng: chex.Array


def step_lr_schedule(
    base_lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int
) -> optax.Schedule:
    """torch StepLR equivalent: lr * gamma ** (epoch // step_size)."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(
    stage: str,
    params: Dict,
    lr: float = 1e-4,
    step_size_epochs: int = 6000,
    gamma: float = 0.2,
    steps_per_epoch: int = 1,
    weight_decay: float = 1e-2,
    trainable_keys: Sequence[str] | None = None,
) -> optax.GradientTransformation:
    trainable = tuple(trainable_keys or STAGE_TRAINABLE[stage])

    labels = {
        k: jax.tree.map(lambda _: "train" if k in trainable else "freeze", v)
        for k, v in params.items()
    }
    schedule = step_lr_schedule(lr, step_size_epochs, gamma, steps_per_epoch)
    # torch AdamW defaults: betas (0.9, 0.999), eps 1e-8, weight_decay 1e-2
    opt = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, labels
    )


def create_train_state(
    params: Dict, optimizer: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    # Copy so the state owns its buffers: the jitted train step donates the
    # whole state (in-place param/opt updates on TPU), which would otherwise
    # invalidate the caller's params on the first step.
    params = jax.tree.map(lambda x: jax.numpy.asarray(x).copy(), params)
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        opt_state=optimizer.init(params),
        rng=rng,
    )
