"""Checkpoint save/restore roundtrips (orbax)."""

import jax
import jax.numpy as jnp
import numpy as np

from seeme_tpu.train.checkpoint import (
    load_pretrained_vae,
    make_manager,
    restore_params,
    restore_state,
    resume_scan,
    save_params,
    save_state,
)
from seeme_tpu.train.state import TrainState, create_train_state, make_optimizer


def make_params(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "vae": {"w": jnp.asarray(rng.randn(4, 4).astype(np.float32))},
        "denoiser": {"w": jnp.asarray(rng.randn(3, 3).astype(np.float32))},
    }


def test_params_roundtrip(tmp_path):
    params = make_params()
    save_params(str(tmp_path / "p"), params)
    restored = restore_params(str(tmp_path / "p"), make_params(seed=1))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )


def test_pretrained_vae_graft(tmp_path):
    """Stage-2 grafts only the vae subtree (`train.py:155-167`)."""
    donor = make_params(seed=0)
    save_params(str(tmp_path / "s1"), donor)
    target = make_params(seed=1)
    out = load_pretrained_vae(str(tmp_path / "s1"), target)
    np.testing.assert_array_equal(np.asarray(out["vae"]["w"]), np.asarray(donor["vae"]["w"]))
    np.testing.assert_array_equal(np.asarray(out["denoiser"]["w"]), np.asarray(target["denoiser"]["w"]))


def test_state_roundtrip_and_resume_scan(tmp_path):
    params = make_params()
    opt = make_optimizer("vae", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(42))
    mgr = make_manager(str(tmp_path))
    save_state(mgr, state, 42)
    template = create_train_state(make_params(seed=1), opt, jax.random.PRNGKey(1))
    restored, step = restore_state(make_manager(str(tmp_path)), template)
    assert step == 42
    np.testing.assert_array_equal(
        np.asarray(restored.params["vae"]["w"]), np.asarray(params["vae"]["w"])
    )
    cfg_path, latest = resume_scan(str(tmp_path))
    assert latest == 42


def test_restore_params_from_state_dir(tmp_path):
    """restore_params accepts a CheckpointManager step dir (<step>/default
    holding the full TrainState) and extracts the params subtrees."""
    import jax
    import jax.numpy as jnp
    import optax

    from seeme_tpu.train.checkpoint import make_manager, restore_params, save_state
    from seeme_tpu.train.state import TrainState

    params = {"vae": {"w": jnp.arange(4.0)}, "denoiser": {"b": jnp.ones((2,))}}
    opt = optax.sgd(1e-2)
    state = TrainState(step=jnp.int32(3), params=params,
                       opt_state=opt.init(params), rng=jax.random.PRNGKey(0))
    mgr = make_manager(str(tmp_path))
    save_state(mgr, state, 3)

    template = {"vae": {"w": jnp.zeros(4)}, "denoiser": {"b": jnp.zeros(2)}}
    out = restore_params(str(tmp_path / "checkpoints" / "3"), template)
    np.testing.assert_allclose(np.asarray(out["vae"]["w"]), np.arange(4.0))

    import pytest

    with pytest.raises(KeyError):
        restore_params(str(tmp_path / "checkpoints" / "3"),
                       {"missing_subtree": {"x": jnp.zeros(1)}})


def test_fresh_run_clears_stale_steps(tmp_path):
    """orbax CheckpointManager SILENTLY skips save(step) when step is below
    the latest existing step dir — a rerun into a used experiment dir logged
    'checkpoint @ N' while writing nothing (observed on a real run). A fresh
    (non-resume) manager must purge stale step dirs; save_state must raise
    rather than lose a checkpoint silently."""
    import os

    import pytest

    params = make_params()
    opt = make_optimizer("vae", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(0))

    save_state(make_manager(str(tmp_path)), state, 100)
    # without fresh=True the lower-step save is skipped -> now an error
    with pytest.raises(RuntimeError, match="skipped"):
        save_state(make_manager(str(tmp_path)), state, 50)

    # fresh manager purges the stale step and the save lands
    save_state(make_manager(str(tmp_path), fresh=True), state, 50)
    ckpts = sorted(os.listdir(tmp_path / "checkpoints"))
    assert "50" in ckpts and "100" not in ckpts


def test_resolve_latest(tmp_path):
    """'checkpoints/latest' resolves to the highest numeric step dir; other
    paths (and 'latest' under a missing/empty dir) pass through. Regression:
    a silently-unresolved PRETRAINED_VAE froze a random VAE in stage 2."""
    from seeme_tpu.train.checkpoint import resolve_latest

    ckpts = tmp_path / "checkpoints"
    ckpts.mkdir()
    for step in (800, 1600, 3200):
        (ckpts / str(step)).mkdir()
    assert resolve_latest(str(ckpts / "latest")) == str(ckpts / "3200")
    assert resolve_latest(str(ckpts / "1600")) == str(ckpts / "1600")
    missing = tmp_path / "nope" / "latest"
    assert resolve_latest(str(missing)) == str(missing)


def test_normalize_resume_dir(tmp_path):
    """Every RESUME spelling (experiment dir / checkpoints dir / step dir /
    'latest') normalizes to the experiment dir, so train.py's
    resuming-in-place check can't be defeated by path spelling and purge the
    resume source's checkpoints (ADVICE r3 medium)."""
    from seeme_tpu.train.checkpoint import normalize_resume_dir

    exp = tmp_path / "exp"
    (exp / "checkpoints" / "3200").mkdir(parents=True)
    want = str(exp.resolve())
    for spelling in (
        str(exp),
        str(exp) + "/",
        str(exp / "checkpoints"),
        str(exp / "checkpoints" / "3200"),
        str(exp / "checkpoints" / "latest"),
    ):
        assert normalize_resume_dir(spelling) == want, spelling
    # a dir whose own name is numeric must not be stripped further than once
    numeric_exp = tmp_path / "42"
    (numeric_exp / "checkpoints").mkdir(parents=True)
    assert normalize_resume_dir(
        str(numeric_exp / "checkpoints")) == str(numeric_exp.resolve())
    # an experiment dir whose own name is numeric (e.g. a sweep index) is
    # NOT a step dir: only strip numeric/'latest' under a checkpoints/ parent
    assert normalize_resume_dir(str(numeric_exp)) == str(numeric_exp.resolve())
    assert normalize_resume_dir(
        str(numeric_exp / "checkpoints" / "latest")) == str(numeric_exp.resolve())
