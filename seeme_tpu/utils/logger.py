"""Experiment-folder logger (`mld/utils/logger.py:9-72` semantics):
`<FOLDER>/<model_type>/<NAME>/` with a timestamped log file, a config
snapshot, and optional TensorBoard events."""

from __future__ import annotations

import logging
import os
import time
from typing import Optional


def create_experiment_dir(cfg, phase: str = "train") -> str:
    folder = str(cfg.get("FOLDER", "./experiments"))
    model_type = str(cfg.select("model.model_type", "mld"))
    name = str(cfg.get("NAME", "exp"))
    exp_dir = os.path.join(folder, model_type, name)
    os.makedirs(exp_dir, exist_ok=True)
    return exp_dir


def create_logger(exp_dir: str, phase: str = "train") -> logging.Logger:
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    logger = logging.getLogger(f"seeme_tpu.{phase}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(exp_dir, f"{stamp}_{phase}.log"))
    sh = logging.StreamHandler()
    fmt = logging.Formatter("%(asctime)s %(message)s")
    fh.setFormatter(fmt)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class TensorBoardWriter:
    """Thin optional-dependency wrapper; no-op when tensorboardX is absent."""

    def __init__(self, exp_dir: str, enabled: bool = True):
        self._w = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter

                self._w = SummaryWriter(os.path.join(exp_dir, "tb"))
            except Exception:
                self._w = None

    def scalars(self, step: int, values: dict, prefix: str = "") -> None:
        if self._w is None:
            return
        for k, v in values.items():
            self._w.add_scalar(f"{prefix}{k}", float(v), step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


class WandbLogger:
    """Optional Weights & Biases logging (`train.py:63-84` in the reference);
    silently disabled when wandb is not installed or PROJECT is null."""

    def __init__(self, cfg, exp_dir: str):
        self._run = None
        project = cfg.select("LOGGER.WANDB.PROJECT", None)
        if not project:
            return
        try:
            import wandb

            self._run = wandb.init(
                project=str(project),
                entity=cfg.select("LOGGER.WANDB.ENTITY", None),
                group=cfg.select("LOGGER.WANDB.GROUP", None),
                dir=exp_dir,
                mode="offline" if cfg.select("LOGGER.WANDB.OFFLINE", False) else "online",
                resume="allow",
                id=cfg.select("LOGGER.WANDB.RESUME_ID", None),
                config=dict(cfg),
            )
        except Exception:
            self._run = None

    def log(self, step: int, values: dict, prefix: str = "") -> None:
        if self._run is not None:
            self._run.log({f"{prefix}{k}": float(v) for k, v in values.items()}, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
