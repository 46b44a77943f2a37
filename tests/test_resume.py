"""Checkpoint/resume integration: training continues from saved state."""

import pytest
import numpy as np

import jax

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.dataset import synthetic_dataset
from simulgen_vae_tpu.data.scaler import data_scaler
from simulgen_vae_tpu.train.vae_trainer import VAETrainer
from simulgen_vae_tpu.utils.checkpoint import CheckpointManager


@pytest.mark.slow
def test_fit_checkpoints_and_resumes(tmp_path):
    data = synthetic_dataset(12, 10, 32, seed=0)
    scaled, _, _ = data_scaler(data, 10, 32, save_path=None)
    cfg = VAEConfig(num_param=12, num_time=10, num_node=32,
                    latent_dim_end=8, latent_dim=4, num_filter_enc=[16, 8],
                    n_epochs=8, batch_size=4, alpha=100.0)

    trainer = VAETrainer(cfg, donate=False)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=2)

    state, _ = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=5,
                           ckpt_manager=mngr, val_every=10)
    mngr.wait()
    assert mngr.latest_step() == 5
    assert int(state.epoch) == 5

    # resume into a fresh trainer from the latest checkpoint
    trainer2 = VAETrainer(cfg, donate=False)
    restored = mngr.restore(trainer2.init_state(jax.random.PRNGKey(9)))
    assert int(restored.epoch) == 5
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state2, hist = trainer2.fit(scaled, jax.random.PRNGKey(1),
                                state=restored, epochs=3, val_every=10)
    assert int(state2.epoch) == 8
    assert np.isfinite(hist["loss"]).all()
    mngr.close()


@pytest.mark.slow
def test_fit_zero_epochs_is_noop(tmp_path):
    data = synthetic_dataset(8, 10, 16, seed=1)
    scaled, _, _ = data_scaler(data, 10, 16, save_path=None)
    cfg = VAEConfig(num_param=8, num_time=10, num_node=16,
                    latent_dim_end=4, latent_dim=2, num_filter_enc=[8, 8],
                    n_epochs=4, batch_size=4, alpha=10.0)
    trainer = VAETrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state2, hist = trainer.fit(scaled, jax.random.PRNGKey(1), state=state,
                               epochs=0)
    assert int(state2.epoch) == 0
    assert hist == {}


def test_restore_across_optimizer_state_dtype(tmp_path, monkeypatch):
    """A checkpoint written with bf16 optimizer moments (the TPU bench
    default) must restore into a trainer configured for f32 state, and
    vice versa: orbax StandardRestore casts to the abstract target's
    dtype, so resume works across a precision-config change instead of
    crashing.  Values must match to bf16 resolution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer
    from simulgen_vae_tpu.data.dataset import synthetic_dataset
    from simulgen_vae_tpu.data.scaler import data_scaler

    cfg = VAEConfig(num_param=8, num_time=10, num_node=16,
                    latent_dim_end=4, latent_dim=2,
                    num_filter_enc=[8, 8], small=True,
                    n_epochs=4, batch_size=4, lr=1e-3, alpha=100.0)
    data = synthetic_dataset(8, 10, 16, seed=3)
    scaled, _, _ = data_scaler(data, 10, 16, save_path=None)

    monkeypatch.setenv("SIMULGEN_OPT_MOMENT_DTYPE", "bfloat16")
    monkeypatch.setenv("SIMULGEN_OPT_SR", "1")
    tr16 = VAETrainer(cfg)
    s16 = tr16.init_state(jax.random.PRNGKey(0))
    s16, _ = tr16._train_epoch(s16, scaled, jax.random.PRNGKey(1))
    assert jax.tree.leaves(s16.opt_state.mu)[0].dtype == jnp.bfloat16

    mngr = CheckpointManager(str(tmp_path / "ck16"), save_interval_epochs=1)
    mngr.save(s16, 1)
    mngr.wait()

    monkeypatch.delenv("SIMULGEN_OPT_MOMENT_DTYPE")
    monkeypatch.delenv("SIMULGEN_OPT_SR")
    tr32 = VAETrainer(cfg)
    s32_tmpl = tr32.init_state(jax.random.PRNGKey(0))
    restored = mngr.restore(s32_tmpl)
    mu32 = jax.tree.leaves(restored.opt_state.mu)
    assert all(m.dtype == jnp.float32 for m in mu32)
    for a, b in zip(mu32, jax.tree.leaves(s16.opt_state.mu)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-2, atol=1e-6)
    # and training continues from the restored state
    restored2, m = tr32._train_epoch(restored, scaled, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
