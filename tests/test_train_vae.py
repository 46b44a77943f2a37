"""End-to-end VAE training slice: jitted epoch runs, loss decreases."""

import numpy as np
import pytest

import jax

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.augmentation import AugmentationConfig
from simulgen_vae_tpu.data.dataset import synthetic_dataset
from simulgen_vae_tpu.data.scaler import data_scaler
from simulgen_vae_tpu.train.vae_trainer import VAETrainer


def small_cfg(**kw):
    defaults = dict(
        num_param=16, num_time=12, num_node=32,
        latent_dim_end=8, latent_dim=4,
        num_filter_enc=[16, 8, 8], small=True,
        n_epochs=30, batch_size=4, lr=1e-3, alpha=100.0,
    )
    defaults.update(kw)
    return VAEConfig(**defaults)


@pytest.fixture(scope="module")
def scaled_data():
    data = synthetic_dataset(16, 12, 32, seed=0)
    scaled, _, _ = data_scaler(data, 12, 32, save_path=None)
    return scaled


@pytest.mark.slow
def test_vae_loss_decreases(scaled_data):
    cfg = small_cfg()
    trainer = VAETrainer(cfg)
    state, hist = trainer.fit(scaled_data, jax.random.PRNGKey(0),
                              val_every=10, epochs=30)
    assert int(state.epoch) == 30
    first = np.mean(hist["recon"][:3])
    last = np.mean(hist["recon"][-3:])
    assert last < first, (first, last)
    assert np.isfinite(hist["loss"]).all()
    assert (hist["grad_norm"] > 0).all()


@pytest.mark.slow
def test_beta_and_lr_follow_schedules(scaled_data):
    cfg = small_cfg(n_epochs=20)
    trainer = VAETrainer(cfg)
    _, hist = trainer.fit(scaled_data, jax.random.PRNGKey(1), val_every=50,
                          epochs=20)
    # beta: 1e-4 until 30% (epoch 6), then rising, 1.0 from 80% (epoch 16)
    np.testing.assert_allclose(hist["beta"][:6], 1e-4, rtol=1e-5)
    assert hist["beta"][10] > 1e-4
    np.testing.assert_allclose(hist["beta"][16:], 1.0, rtol=1e-5)
    # lr: cosine warm restarts with T_0 = 5 -> restarts at epochs 5, 15
    np.testing.assert_allclose(hist["lr"][0], cfg.lr, rtol=1e-5)
    np.testing.assert_allclose(hist["lr"][5], cfg.lr, rtol=1e-5)
    assert hist["lr"][4] < cfg.lr * 0.1


@pytest.mark.slow
def test_spectral_norm_threads_through_training(scaled_data):
    cfg = small_cfg(n_epochs=4)
    trainer = VAETrainer(cfg)
    state, _ = trainer.fit(scaled_data, jax.random.PRNGKey(2), epochs=2)
    flat_u = jax.tree.leaves(state.sn_u)
    assert len(flat_u) > 0
    for u in flat_u:
        np.testing.assert_allclose(np.linalg.norm(np.asarray(u)), 1.0, rtol=1e-4)

    # eval params differ from raw params on kernels (normalization applied)
    from flax import traverse_util

    normed = trainer.eval_params(state)
    raw_flat = traverse_util.flatten_dict(state.params)
    normed_flat = traverse_util.flatten_dict(normed)
    kernel_paths = [p for p in raw_flat if p[-1] == "kernel"]
    assert kernel_paths
    diffs = [
        not np.allclose(np.asarray(raw_flat[p]), np.asarray(normed_flat[p]))
        for p in kernel_paths
    ]
    assert all(diffs)


@pytest.mark.slow
def test_training_without_spectral_norm(scaled_data):
    cfg = small_cfg(n_epochs=4, use_spectral_norm=False)
    trainer = VAETrainer(cfg)
    state, hist = trainer.fit(scaled_data, jax.random.PRNGKey(3), epochs=2)
    assert np.isfinite(hist["loss"]).all()


@pytest.mark.slow
def test_bf16_training_runs(scaled_data):
    cfg = small_cfg(n_epochs=4, dtype="bfloat16")
    trainer = VAETrainer(cfg)
    state, hist = trainer.fit(scaled_data, jax.random.PRNGKey(4), epochs=2)
    assert np.isfinite(hist["loss"]).all()
    # params stay f32
    assert all(p.dtype == np.float32 for p in jax.tree.leaves(state.params))


@pytest.mark.slow
def test_sn_per_epoch_cadence(scaled_data, monkeypatch):
    """SIMULGEN_SN_PER_EPOCH=1 refreshes the power iteration at the epoch
    boundary only.  With ONE batch per epoch the per-step and per-epoch
    cadences are mathematically identical (the only refresh IS the step-0
    refresh); with several batches the run must still train stably."""
    import jax.numpy as jnp

    # exact-equivalence geometry: batch_size == num_param -> 1 step/epoch
    cfg = small_cfg(n_epochs=4, batch_size=16)
    base = VAETrainer(cfg)
    s0 = base.init_state(jax.random.PRNGKey(5))
    ref_state, ref_m = base._train_epoch(s0, scaled_data,
                                         jax.random.PRNGKey(6))

    monkeypatch.setenv("SIMULGEN_SN_PER_EPOCH", "1")
    hoisted = VAETrainer(cfg)
    s0b = hoisted.init_state(jax.random.PRNGKey(5))
    h_state, h_m = hoisted._train_epoch(s0b, scaled_data,
                                        jax.random.PRNGKey(6))
    np.testing.assert_allclose(float(ref_m["loss"]), float(h_m["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(h_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # multi-batch: still trains, u stays unit-norm
    cfg2 = small_cfg(n_epochs=8)
    tr = VAETrainer(cfg2)
    state, hist = tr.fit(scaled_data, jax.random.PRNGKey(7), epochs=8)
    assert np.isfinite(hist["loss"]).all()
    first, last = np.mean(hist["recon"][:2]), np.mean(hist["recon"][-2:])
    assert last < first, (first, last)
    for u in jax.tree.leaves(state.sn_u):
        np.testing.assert_allclose(np.linalg.norm(np.asarray(u)), 1.0,
                                   rtol=1e-4)
