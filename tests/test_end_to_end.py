"""End-to-end slice: stage-1 VAE training, stage-2 diffusion training, and
conditional DDIM sampling on synthetic EgoBody-shaped data — single device and
on the virtual 8-device mesh (the reference could never test multi-device
without a cluster; we can, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seeme_tpu.core import synthetic_smpl
from seeme_tpu.data import SyntheticEgoDataset, validate_batch
from seeme_tpu.models.seeme import SeeMeConfig, SeeMeSystem
from seeme_tpu.parallel import make_mesh, shard_batch
from seeme_tpu.train import (
    create_train_state,
    make_eval_sample_step,
    make_optimizer,
    make_train_step,
    run_epoch,
)

T = 16  # short motions keep CPU tests fast; the graph is identical at T=60


# heavy jit compiles / 8-device mesh / interpret-mode Pallas: excluded
# from the smoke tier (pytest -m "not slow")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = SeeMeConfig(motion_length=T, scene_points=64)
    smpl = synthetic_smpl(n_verts=128)
    data = SyntheticEgoDataset(num_samples=16, motion_length=T, scene_points=64, seed=0)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))
    return cfg, system, data, params


def test_batch_contract(setup):
    _, _, data, _ = setup
    batch = next(data.batches(4))
    validate_batch(batch, pose_feats=72, motion_length=T)


def test_vae_training_reduces_loss(setup):
    cfg, system, data, params = setup
    opt = make_optimizer("vae", params, lr=3e-4)
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step = make_train_step(system, "vae", opt)

    losses = []
    for epoch in range(8):
        state, means = run_epoch(step, state, data.batches(8, seed=epoch))
        losses.append(means["total"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_stage2_freezes_vae(setup):
    cfg, system, data, params = setup
    opt = make_optimizer("diffusion", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(2))
    step = make_train_step(system, "diffusion", opt)
    vae_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["vae"])
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(8)).items()}
    state, terms = step(state, batch)
    state, terms = step(state, batch)
    assert np.isfinite(float(terms["inst_loss"]))
    # VAE untouched; denoiser updated
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        vae_before,
        state.params["vae"],
    )
    changed = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
            params["denoiser"],
            state.params["denoiser"],
        )
    )
    assert any(changed)


def test_diffusion_training_reduces_loss(setup):
    cfg, system, data, params = setup
    opt = make_optimizer("diffusion", params, lr=1e-3)
    state = create_train_state(params, opt, jax.random.PRNGKey(3))
    step = make_train_step(system, "diffusion", opt)
    losses = []
    for epoch in range(40):
        state, means = run_epoch(step, state, data.batches(8, seed=epoch))
        losses.append(means["total"])
    assert np.isfinite(losses).all()
    # per-step noise/timestep sampling makes single epochs noisy; compare means
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.98, losses


def test_sampling_shapes_and_determinism(setup):
    cfg, system, data, params = setup
    sample = make_eval_sample_step(system)
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(4)).items()}
    out1 = sample(params, batch, jax.random.PRNGKey(7))
    out2 = sample(params, batch, jax.random.PRNGKey(7))
    assert out1.shape == (4, T, cfg.nfeats)
    np.testing.assert_allclose(out1, out2, atol=1e-5)
    out3 = sample(params, batch, jax.random.PRNGKey(8))
    assert not np.allclose(out1, out3, atol=1e-3)


def test_sharded_train_step_8_devices(setup):
    cfg, system, data, params = setup
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    opt = make_optimizer("diffusion", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(4))
    step = make_train_step(system, "diffusion", opt, mesh=mesh)
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in next(data.batches(8)).items()})
    state, terms = step(state, batch)
    assert np.isfinite(float(terms["total"]))
    # parity with single-device step on identical inputs
    state1 = create_train_state(params, opt, jax.random.PRNGKey(4))
    step1 = make_train_step(system, "diffusion", opt)
    batch1 = {k: jnp.asarray(v) for k, v in next(data.batches(8)).items()}
    state1, terms1 = step1(state1, batch1)
    np.testing.assert_allclose(float(terms["total"]), float(terms1["total"]), rtol=1e-4)


def test_sharded_vae_step_8_devices(setup):
    cfg, system, data, params = setup
    mesh = make_mesh()
    opt = make_optimizer("vae", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(5))
    step = make_train_step(system, "vae", opt, mesh=mesh)
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in next(data.batches(8)).items()})
    state, terms = step(state, batch)
    assert np.isfinite(float(terms["total"]))


def test_image_conditioning_path():
    """condition ['interactee','scene','image'] — the full SEE-ME surface."""
    cfg = SeeMeConfig(motion_length=8, scene_points=64,
                      condition=("interactee", "scene", "image"),
                      num_inference_timesteps=3)
    smpl = synthetic_smpl(n_verts=64)
    data = SyntheticEgoDataset(num_samples=4, motion_length=8, scene_points=64,
                               with_image=True, image_size=64, seed=0)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    assert system.n_cond_tokens == 3
    params = system.init_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(4)).items()}
    loss, terms = system.diffusion_loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = system.sample(params, batch, jax.random.PRNGKey(2))
    assert out.shape == (4, 8, cfg.nfeats)

    # the frozen-image-feature cache (train.py stage-2 precompute) must be
    # bit-identical to encoding the raw crops in-step, like the scene cache
    feats = system.image_features(params, batch["image"])
    cached = dict(batch)
    cached.pop("image")
    cached["image_feats"] = feats
    loss_c, _ = system.diffusion_loss(params, cached, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(loss), np.asarray(loss_c))


def test_tensor_parallel_shardings():
    """(4, 2) dp x tp mesh: large kernels column-sharded over 'model',
    the forward/loss still computes correctly with XLA-inserted collectives."""
    from seeme_tpu.parallel import infer_param_shardings, shard_params

    cfg = SeeMeConfig(motion_length=8, scene_points=64, ff_size=512)
    smpl = synthetic_smpl(n_verts=64)
    data = SyntheticEgoDataset(num_samples=8, motion_length=8, scene_points=64, seed=0)
    system = SeeMeSystem(cfg, smpl, data.mean, data.std)
    params = system.init_params(jax.random.PRNGKey(0))

    mesh = make_mesh(data_axis=4, model_axis=2)
    shardings = infer_param_shardings(params, mesh)
    specs = {s.spec for s in jax.tree.leaves(shardings)}
    assert any(spec != () and spec is not None and len(spec) and spec[-1] == "model"
               for spec in specs if spec), specs  # something actually TP-sharded

    sharded = shard_params(params, mesh)
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in next(data.batches(8)).items()})
    loss_tp, _ = jax.jit(system.diffusion_loss)(sharded, batch, jax.random.PRNGKey(1))
    loss_rep, _ = jax.jit(system.diffusion_loss)(params, {k: jnp.asarray(v) for k, v in next(data.batches(8)).items()}, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_tp), float(loss_rep), rtol=1e-4)


def test_scene_feature_cache_matches_raw_encoding(setup):
    """The stage-2 frozen-scene cache (train.py precompute ->
    batch['scene_feats']) must be numerically identical to encoding the raw
    point cloud in the loss — same function, same frozen params."""
    import jax
    import jax.numpy as jnp

    _, system, data, params = setup
    batch_np = next(data.batches(4, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(3)
    loss_raw, _ = system.diffusion_loss(params, batch, rng)

    feats = system.scene_features(params, batch["scene"])
    batch_cached = dict(batch)
    batch_cached["scene_feats"] = feats
    loss_cached, _ = system.diffusion_loss(params, batch_cached, rng)
    np.testing.assert_allclose(float(loss_raw), float(loss_cached), rtol=1e-6)


def test_scan_dispatch_matches_single_steps(setup):
    """k-step scan dispatch (`make_scan_train_step` + run_epoch grouping,
    incl. the epoch tail that doesn't fill a group) must train on exactly
    the same batches with the same RNG/optimizer-count threading as k
    single-step dispatches."""
    from seeme_tpu.train import make_scan_train_step

    _, system, data, params = setup
    opt = make_optimizer("diffusion", params, lr=1e-3)

    def batches():
        # 8 batches with k=3 -> two scanned groups + a 2-batch tail
        return data.batches(2, seed=11, shuffle=False)

    state_a = create_train_state(params, opt, jax.random.PRNGKey(9))
    single = make_train_step(system, "diffusion", opt)
    state_a, means_a = run_epoch(single, state_a, batches())

    state_b = create_train_state(params, opt, jax.random.PRNGKey(9))
    scan = make_scan_train_step(system, "diffusion", opt)
    state_b, means_b = run_epoch(
        single, state_b, batches(), scan_step=scan, steps_per_dispatch=3
    )

    assert int(state_a.step) == int(state_b.step)
    for k in means_a:
        np.testing.assert_allclose(means_a[k], means_b[k], rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        state_a.params,
        state_b.params,
    )


def test_scan_dispatch_8_devices(setup):
    """The scanned step under the (data, model) mesh: [k, B, ...] stacks
    sharded on the batch axis, state replicated."""
    from seeme_tpu.parallel import stacked_batch_sharding
    from seeme_tpu.train import make_scan_train_step

    _, system, data, params = setup
    mesh = make_mesh()
    opt = make_optimizer("diffusion", params)
    state = create_train_state(params, opt, jax.random.PRNGKey(10))
    scan = make_scan_train_step(system, "diffusion", opt, mesh=mesh)
    bs = [next(it) for it in [iter(data.batches(8, shuffle=False))] for _ in range(2)]
    stacked = {
        k: jax.device_put(np.stack([b[k] for b in bs]), stacked_batch_sharding(mesh))
        for k in bs[0]
    }
    state, terms = scan(state, stacked)
    assert int(state.step) == 2
    assert np.isfinite(float(terms["total"]))


def test_device_data_epoch_matches_host_batches(setup):
    """Device-resident gather dispatch (make_gather_scan_train_step +
    run_epoch_device, incl. a tail group) must train identically to host-
    sliced batches through run_epoch — the shared epoch_indices generator
    guarantees the same batch order, this guarantees the same math."""
    from seeme_tpu.train import make_gather_scan_train_step, run_epoch_device

    _, system, data, params = setup
    opt = make_optimizer("diffusion", params, lr=1e-3)

    state_a = create_train_state(params, opt, jax.random.PRNGKey(12))
    single = make_train_step(system, "diffusion", opt)
    state_a, means_a = run_epoch(single, state_a, data.batches(2, seed=21))

    state_b = create_train_state(params, opt, jax.random.PRNGKey(12))
    gather = make_gather_scan_train_step(system, "diffusion", opt)
    device_data = {k: jnp.asarray(v) for k, v in data.split_arrays().items()}
    state_b, means_b = run_epoch_device(
        gather, state_b, device_data,
        data.batch_indices(2, seed=21), steps_per_dispatch=3,
    )

    assert int(state_a.step) == int(state_b.step)
    for k in means_a:
        np.testing.assert_allclose(means_a[k], means_b[k], rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        state_a.params,
        state_b.params,
    )
