"""Fixed-shape batch contract.

The reference moves condition-dependent *tuples* through Lightning
(`mld/data/humanml/data/dataset.py:1747-1794`, unpacked by position at
`mld.py:889-926`). Here a batch is a dict of fixed-shape arrays — an explicit,
jit-stable pytree:

  feats   (B, T, 2, P)   normalized pose features, actor 0 = wearer,
                         actor 1 = interactee (P=72 egobody / 66 gimo)
  transl  (B, 2, T, 3)   normalized translations (dims P..P+2 of mean/std)
  betas   (B, 2, T, 10)  SMPL shape coefficients (not normalized)
  cam     (B, T, 6)      camera utils [fx, cx, cy, center_x, center_y, scale]
  scene   (B, N, 3)      scene point cloud (only when 'scene' in condition)
  length  (B,)           valid frame counts (int32)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def validate_batch(batch: Dict, pose_feats: int = 72, motion_length: int = 60) -> None:
    B, T = batch["feats"].shape[0], batch["feats"].shape[1]
    assert batch["feats"].shape == (B, T, 2, pose_feats), batch["feats"].shape
    assert batch["transl"].shape == (B, 2, T, 3), batch["transl"].shape
    assert batch["betas"].shape == (B, 2, T, 10), batch["betas"].shape
    assert batch["length"].shape == (B,), batch["length"].shape
    assert T == motion_length
    if "scene" in batch:
        assert batch["scene"].ndim == 3 and batch["scene"].shape[-1] == 3


def host_to_device(batch: Dict) -> Dict:
    return {k: jnp.asarray(v) for k, v in batch.items()}


def stack_examples(examples) -> Dict:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples]) for k in keys}


def _first_len(v):
    if isinstance(v, np.ndarray) or isinstance(v, list):
        return len(v)
    if isinstance(v, dict):
        for x in v.values():
            n = _first_len(x)
            if n is not None:
                return n
    return None


def _pad_rows(v, pad: int):
    if isinstance(v, np.ndarray):
        return np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
    if isinstance(v, list):
        return v + [v[-1]] * pad
    if isinstance(v, dict):
        return {k: _pad_rows(x, pad) for k, x in v.items()}
    return v


def pad_batch(batch: Dict, batch_size: int):
    """Pad every per-sample field (arrays, lists, nested dicts of them) to
    `batch_size` rows by repeating the last example; returns
    (padded_batch, n_valid). Keeps one fixed compiled shape under jit while
    letting eval cover a trailing partial batch."""
    n = _first_len(batch)
    if n is None or n >= batch_size:
        return batch, n if n is not None else batch_size
    return _pad_rows(batch, batch_size - n), n


def eval_batches(datamodule, split: str, batch_size: int, seed: int = 0):
    """Yield (batch, n_valid) covering EVERY sample of `split` exactly once.

    Evaluation must not drop the trailing partial batch (the reference's test
    DataLoaders run with drop_last=False — `mld/data/base.py` test_dataloader;
    dropping it skews metrics, and when the split is smaller than the batch it
    silently empties the eval). The partial batch is padded to the compiled
    `batch_size` (see `pad_batch`); callers slice outputs to `n_valid`."""
    for batch in datamodule.batches(split, batch_size, shuffle=False,
                                    seed=seed, drop_last=False):
        yield pad_batch(batch, batch_size)


def epoch_indices(
    n: int, batch_size: int, shuffle: bool = True, seed: int = 0,
    drop_last: bool = True,
):
    """The one batch-order generator every loader slices with: yields int
    index arrays [batch_size] per step. Shared by host-sliced `batches()`
    and the device-resident gather path (train.py TRAIN.DEVICE_DATA), so the
    two modes train on bit-identical batch sequences."""
    idx = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    stop = (n // batch_size) * batch_size if drop_last else n
    for i in range(0, stop, batch_size):
        yield idx[i : i + batch_size]
