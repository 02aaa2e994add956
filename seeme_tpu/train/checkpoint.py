"""Checkpoint save/resume with the reference's experiment-folder UX.

The reference saves `epoch={N}.ckpt` under `<exp>/checkpoints/` every
SACE_CHECKPOINT_EPOCH epochs, keep-all (`train.py:114-123`), and resume scans
the experiment dir for the newest config yaml + the highest-epoch ckpt
(`train.py:26-53`). Same layout here with orbax as the storage engine:
`<exp>/checkpoints/<step>/` managed by CheckpointManager, plus a
`config.yaml` snapshot at the experiment root (the `create_logger` snapshot,
`mld/utils/logger.py:38-53`).

Cross-stage loading: stage 2 restores only the `vae` subtree from a stage-1
checkpoint (the reference strips the `vae.` prefix and loads strict,
`train.py:155-167`)."""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def make_manager(
    exp_dir: str, keep_every: int = 1, fresh: bool = False
) -> ocp.CheckpointManager:
    """`fresh=True` clears numeric step dirs left by earlier runs: orbax's
    CheckpointManager SILENTLY skips `save(step)` when `step` is below the
    latest existing step, so a rerun into a used experiment dir would log
    'checkpoint @ step N' while writing nothing (observed; regression test
    in tests/test_checkpoint.py)."""
    ckpt_dir = _abs(os.path.join(exp_dir, "checkpoints"))
    os.makedirs(ckpt_dir, exist_ok=True)
    if fresh:
        import logging
        import shutil

        stale = [d for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d)]
        for d in stale:
            shutil.rmtree(os.path.join(ckpt_dir, d))
        if stale:
            logging.getLogger("seeme_tpu.train").warning(
                "cleared %d checkpoint step dir(s) left in %s by an earlier "
                "run (fresh run; orbax skips saves below the stale latest "
                "step)", len(stale), ckpt_dir)
    options = ocp.CheckpointManagerOptions(max_to_keep=None, create=True)
    return ocp.CheckpointManager(ckpt_dir, options=options)


def save_state(manager: ocp.CheckpointManager, state: TrainState, step: int) -> None:
    saved = manager.save(step, args=ocp.args.StandardSave(_host(state)))
    manager.wait_until_finished()
    if not saved:
        raise RuntimeError(
            f"orbax skipped the checkpoint save at step {step} (latest "
            f"existing step: {manager.latest_step()}) — stale step dirs "
            "from an earlier run? Start non-resume runs with "
            "make_manager(..., fresh=True)")


def _host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def restore_state(
    manager: ocp.CheckpointManager, template: TrainState, step: Optional[int] = None
) -> Tuple[TrainState, int]:
    step = manager.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    restored = manager.restore(step, args=ocp.args.StandardRestore(_host(template)))
    return jax.tree.map(jax.numpy.asarray, restored), int(step)


def latest_checkpoint_step(exp_dir: str) -> Optional[int]:
    ckpt_dir = _abs(os.path.join(exp_dir, "checkpoints"))
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def resolve_latest(path: str) -> str:
    """Resolve a '.../checkpoints/latest' path to the highest numeric step
    dir (the configs' PRETRAINED_VAE contract; no literal 'latest' entry is
    ever written on disk). Any other path passes through unchanged."""
    if os.path.basename(path) != "latest":
        return path
    ckpt_dir = os.path.dirname(path)
    if not os.path.isdir(ckpt_dir):
        return path
    steps = [int(d) for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d)]
    return os.path.join(ckpt_dir, str(max(steps))) if steps else path


def normalize_resume_dir(resume: str) -> str:
    """Normalize a TRAIN.RESUME spelling to its experiment dir.

    Accepts the experiment dir itself, its `checkpoints/` dir, or a step /
    `latest` entry under it — so path-spelling variants can't defeat
    train.py's resuming-in-place check (which decides whether the fresh
    manager may purge stale step dirs; a mis-resolved path used to delete
    the resume source's checkpoints — ADVICE r3)."""
    r = os.path.abspath(os.path.expanduser(resume))
    # Only strip a step / 'latest' component when it actually sits under a
    # `checkpoints/` dir — an experiment dir whose own name happens to be
    # numeric (e.g. a sweep index) must not be normalized to its parent.
    if (os.path.basename(r).isdigit() or os.path.basename(r) == "latest") and (
        os.path.basename(os.path.dirname(r)) == "checkpoints"
    ):
        r = os.path.dirname(r)
    if os.path.basename(r) == "checkpoints":
        r = os.path.dirname(r)
    return r


def save_params(path: str, params: Dict) -> None:
    """Standalone params-only checkpoint (cross-stage / eval handoff)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), _host(params))
    ckptr.wait_until_finished()


def restore_params(path: str, template: Dict) -> Dict:
    """Restore a params pytree from either a params-only checkpoint
    (`save_params`) or a CheckpointManager train-state step directory
    (`<exp>/checkpoints/<step>`, which stores the full TrainState under
    `default/` — the test CLI accepts both)."""
    p = _abs(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.isdir(os.path.join(p, "default")):
        restored = ckptr.restore(os.path.join(p, "default"))
        if isinstance(restored, dict) and "params" in restored:
            restored = restored["params"]
        missing = set(template) - set(restored)
        if missing:
            raise KeyError(f"checkpoint at {p} lacks param subtrees {missing}")
        restored = {k: restored[k] for k in template}
    else:
        restored = ckptr.restore(p, _host(template))
    return jax.tree.map(jax.numpy.asarray, restored)


def load_pretrained_vae(path: str, params: Dict) -> Dict:
    """Graft the `vae` subtree of a stage-1 checkpoint into `params`
    (the PRETRAINED_VAE load, `train.py:155-167`). Accepts either a
    params-only `save_params` checkpoint or a training run's
    `<exp>/checkpoints/<step>` directory (TrainState under `default/`).
    Restores without a template (the donor may hold more subtrees)."""
    ckptr = ocp.StandardCheckpointer()
    p = _abs(path)
    if os.path.isdir(os.path.join(p, "default")):
        donor = ckptr.restore(os.path.join(p, "default"))
        if isinstance(donor, dict) and "params" in donor:
            donor = donor["params"]
    else:
        donor = ckptr.restore(p)
    if "vae" not in donor:
        raise KeyError(f"checkpoint {path} has no 'vae' subtree: {list(donor)}")
    out = dict(params)
    out["vae"] = jax.tree.map(jax.numpy.asarray, donor["vae"])
    return out


def resume_scan(exp_dir: str) -> Tuple[Optional[str], Optional[int]]:
    """Find (config_snapshot, latest_step) in an experiment dir
    (`train.py:26-53`)."""
    cfg = os.path.join(exp_dir, "config.yaml")
    return (cfg if os.path.exists(cfg) else None), latest_checkpoint_step(exp_dir)
