"""Eval-coverage contract: `eval_batches` must cover EVERY test sample.

Regression for the round-4 a2m eval crash: the synthetic HumanAct12 test
split (60 samples) is smaller than TEST.BATCH_SIZE (64), and the old
drop_last=True eval iteration yielded zero batches — `ActionMetrics.compute`
then blew up on an empty accumulator. The reference evaluates with
drop_last=False (torch test DataLoaders); under jit we additionally pad the
trailing partial batch to one fixed compiled shape (`pad_batch`)."""

import os

import numpy as np
import pytest

from seeme_tpu.data.batch import eval_batches, pad_batch

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_pad_batch_arrays_lists_nested():
    batch = {
        "motion": np.arange(12, dtype=np.float32).reshape(3, 4),
        "text": ["a", "b", "c"],
        "smpl_params": {"betas": np.ones((3, 10), np.float32)},
        "static": 7,
    }
    padded, n = pad_batch(batch, 5)
    assert n == 3
    assert padded["motion"].shape == (5, 4)
    np.testing.assert_array_equal(padded["motion"][3], padded["motion"][2])
    assert padded["text"] == ["a", "b", "c", "c", "c"]
    assert padded["smpl_params"]["betas"].shape == (5, 10)
    assert padded["static"] == 7
    # full batch passes through untouched
    same, n_full = pad_batch(batch, 3)
    assert n_full == 3 and same["motion"] is batch["motion"]


def test_a2m_split_smaller_than_batch_still_evaluated():
    from seeme_tpu.data.registry import SyntheticA2MDataModule

    dm = SyntheticA2MDataModule({})  # test split: 240 // 4 = 60 samples
    n_test = len(dm.split_arrays("test")["motion"])
    assert n_test == 60

    got = list(eval_batches(dm, "test", 64))
    assert len(got) == 1
    batch, n_valid = got[0]
    assert n_valid == 60
    assert batch["motion"].shape[0] == 64  # padded to the compiled shape
    np.testing.assert_array_equal(batch["action"][60:], batch["action"][59])


@pytest.mark.parametrize("batch_size", [16, 64])
def test_eval_batches_cover_every_sample_once(batch_size):
    from seeme_tpu.data.registry import SyntheticA2MDataModule

    dm = SyntheticA2MDataModule({})
    ref = dm.split_arrays("test")["motion"]
    rows = []
    for batch, n in eval_batches(dm, "test", batch_size):
        assert batch["motion"].shape[0] == batch_size
        rows.append(batch["motion"][:n])
    np.testing.assert_array_equal(np.concatenate(rows), ref)


def test_eval_batches_synthetic_humanml_lists():
    from seeme_tpu.config import load_config

    cfg = load_config(os.path.join(CONFIGS, "config_mld_humanml3d.yaml"))
    from seeme_tpu.data import get_datamodule

    dm = get_datamodule(cfg)
    total = 0
    for batch, n in eval_batches(dm, "test", 48):
        assert len(batch["text"]) == 48
        assert batch["motion"].shape[0] == 48
        total += n
    assert total == len(dm._sets["test"])


def test_action_metrics_empty_raises():
    from seeme_tpu.eval import ActionMetrics

    with pytest.raises(RuntimeError, match="no accumulated batches"):
        ActionMetrics(num_classes=12).compute()
