"""Component registry: explicit `target:` resolution.

The reference instantiates modules from dotted import strings
(`instantiate_from_config`, `mld/config.py:17-32`) — arbitrary code loading
driven by yaml. Here targets resolve through an explicit allow-list registry;
unknown targets fail loudly with the registered options. The yaml surface is
unchanged (`target:` + `params:`), including the reference's dotted names,
which alias to the native implementations.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_COMPONENTS: Dict[str, Callable] = {}


def register_component(*names: str):
    def deco(fn):
        for n in names:
            _COMPONENTS[n] = fn
        return fn

    return deco


def _populate() -> None:
    if _COMPONENTS:
        return
    from ..diffusion.schedulers import DiffusionSchedule
    from ..models.denoiser import Denoiser
    from ..models.text_encoder import ClipTextEncoder
    from ..models.vae import MotionVae
    from ..nn.gru import MotionEncoderBiGRUCo, MovementConvEncoder, TextEncoderBiGRUCo
    from ..nn.pointnet import ResnetPointnet
    from ..nn.resnet import resnet50

    pairs = {
        # native names + the reference's dotted targets as aliases
        "seeme_tpu.MotionVae": MotionVae,
        "mld.models.architectures.mld_vae.MldVae": MotionVae,
        "seeme_tpu.Denoiser": Denoiser,
        "mld.models.architectures.mld_denoiser.MldDenoiser": Denoiser,
        "seeme_tpu.DiffusionSchedule": DiffusionSchedule,
        "diffusers.DDIMScheduler": DiffusionSchedule,
        "diffusers.DDPMScheduler": DiffusionSchedule,
        "seeme_tpu.ClipTextEncoder": ClipTextEncoder,
        "mld.models.architectures.mld_clip.MldTextEncoder": ClipTextEncoder,
        "seeme_tpu.ResnetPointnet": ResnetPointnet,
        "seeme_tpu.resnet50": resnet50,
        "mld.models.architectures.t2m_textenc.TextEncoderBiGRUCo": TextEncoderBiGRUCo,
        "mld.models.architectures.t2m_textenc.MovementConvEncoder": MovementConvEncoder,
        "mld.models.architectures.t2m_motionenc.MotionEncoder": MotionEncoderBiGRUCo,
    }
    _COMPONENTS.update(pairs)


def get_component(target: str) -> Callable:
    _populate()
    if target not in _COMPONENTS:
        raise KeyError(
            f"unknown component target {target!r}; registered: "
            f"{sorted(_COMPONENTS)}"
        )
    return _COMPONENTS[target]


def instantiate_from_config(node: Dict, **overrides: Any):
    """{'target': ..., 'params': {...}} -> instance (`mld/config.py:25-32`),
    resolved through the registry instead of import-by-string. Params the
    native constructor does not accept are dropped (the reference's modules
    swallow extras via **kwargs)."""
    import inspect

    ctor = get_component(str(node["target"]))
    params = dict(node.get("params", {}) or {})
    params.update(overrides)
    try:
        sig = inspect.signature(ctor)
        if not any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
        ):
            params = {k: v for k, v in params.items() if k in sig.parameters}
    except (TypeError, ValueError):
        pass
    return ctor(**params)
