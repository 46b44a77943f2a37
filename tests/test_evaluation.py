"""Reconstruction evaluation + comparison evaluator + checkpointing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models import VAE


@pytest.fixture(scope="module")
def tiny_vae():
    filters = [16, 8, 8]
    model = VAE(latent_dim=8, hierarchical_dim=4, num_filter_enc=filters,
                num_filter_dec=filters[::-1], num_node=32, num_time=10,
                small=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 10, 32))
    params = model.init({"params": key, "sample": key}, x)["params"]
    return model, params


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((10, 10, 32)) * 0.3).astype(np.float32)


def test_evaluate_vae_reconstruction_contract(tiny_vae, data):
    from simulgen_vae_tpu.evaluation import evaluate_vae_reconstruction

    model, params = tiny_vae
    lv, hier, loss, recon, total = evaluate_vae_reconstruction(
        model, params, data, jax.random.PRNGKey(0), recon_iter=2,
        batch_size=4, verbose=False,
    )
    assert lv.shape == (10, 8)
    assert hier.shape == (10, 2, 4)   # len(filters)-1 = 2 hier latents
    assert loss.shape == (10,)
    assert recon.shape == data.shape
    assert np.isfinite(total)
    np.testing.assert_allclose(total, loss.sum(), rtol=1e-5)


def test_recon_iter_best_of(tiny_vae, data):
    """More attempts can only improve (or tie) the best per-sample MSE."""
    from simulgen_vae_tpu.evaluation import evaluate_vae_reconstruction

    model, params = tiny_vae
    _, _, loss1, _, _ = evaluate_vae_reconstruction(
        model, params, data, jax.random.PRNGKey(5), recon_iter=1,
        batch_size=5, verbose=False,
    )
    _, _, loss8, _, _ = evaluate_vae_reconstruction(
        model, params, data, jax.random.PRNGKey(5), recon_iter=8,
        batch_size=5, verbose=False,
    )
    assert (loss8 <= loss1 + 1e-7).all()


def test_reconstruction_evaluator(tiny_vae, data, tmp_path):
    from simulgen_vae_tpu.data.scaler import latent_conditioner_scaler
    from simulgen_vae_tpu.evaluation import (
        ReconstructionEvaluator,
        evaluate_vae_reconstruction,
    )

    model, params = tiny_vae
    lv, hier, _, _, _ = evaluate_vae_reconstruction(
        model, params, data, jax.random.PRNGKey(0), verbose=False,
    )
    y1_scaled, lv_scaler = latent_conditioner_scaler(lv, None)
    hier_flat = hier.reshape(10, -1)
    y2_scaled_flat, xs_scaler = latent_conditioner_scaler(hier_flat, None)
    y2_scaled = y2_scaled_flat.reshape(hier.shape)

    ev = ReconstructionEvaluator(model, params, num_time=10)

    def fake_conditioner(x):
        # perfect predictor: returns the scaled true latents
        return jnp.asarray(y1_scaled), jnp.asarray(y2_scaled)

    out = ev.evaluate_reconstruction_comparison(
        fake_conditioner, np.zeros((10, 4), np.float32),
        y1_scaled, y2_scaled, data, lv_scaler, xs_scaler,
        save_dir=str(tmp_path), max_plots=2,
    )
    assert out["pred_mse"].shape == (10,)
    # perfect conditioner -> identical branches
    np.testing.assert_allclose(out["pred_mse"], out["true_mse"], rtol=1e-4,
                               atol=1e-7)
    assert (tmp_path / "reconstruction_dual_view_0.png").exists()


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer
    from simulgen_vae_tpu.utils.checkpoint import CheckpointManager

    cfg = VAEConfig(num_param=8, num_time=8, num_node=16, latent_dim_end=4,
                    latent_dim=2, num_filter_enc=[8, 8], n_epochs=10,
                    batch_size=4, alpha=10.0)
    trainer = VAETrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=1)
    mngr.save(state, epoch=3)
    mngr.wait()
    assert mngr.latest_step() == 3

    template = trainer.init_state(jax.random.PRNGKey(42))  # different values
    restored = mngr.restore(template)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.epoch) == int(state.epoch)
    mngr.close()


def test_save_latents_artifacts(tmp_path):
    from simulgen_vae_tpu.utils.checkpoint import save_l2_loss, save_latents

    lv = np.random.randn(5, 8)
    hier = np.random.randn(5, 2, 4)
    save_latents(str(tmp_path), lv, hier)
    assert (tmp_path / "latent_vectors.npy").exists()
    assert (tmp_path / "xs.npy").exists()
    np.testing.assert_array_equal(np.load(tmp_path / "latent_vectors.npy"), lv)

    save_l2_loss(str(tmp_path / "loss.txt"), np.abs(np.random.randn(5)))
    assert (tmp_path / "loss.txt").exists()
