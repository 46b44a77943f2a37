"""Divergence guard: non-finite train loss -> rollback to the last
checkpoint (or the E2E best-state) and retry with fresh randomness.

The reference has no divergence handling at all — a NaN loss poisons every
subsequent epoch silently (SURVEY §5 "failure detection").  These tests
inject NaNs by wrapping the jitted ``_train_epoch`` attribute, so the guard
logic is exercised without having to actually diverge the optimizer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.dataset import synthetic_dataset
from simulgen_vae_tpu.data.scaler import data_scaler
from simulgen_vae_tpu.models import LatentConditioner, VAE
from simulgen_vae_tpu.train.lc_e2e_trainer import E2ETrainer
from simulgen_vae_tpu.train.lc_trainer import LCTrainer
from simulgen_vae_tpu.train.vae_trainer import VAETrainer
from simulgen_vae_tpu.utils.checkpoint import CheckpointManager


def _vae_setup():
    cfg = VAEConfig(num_param=8, num_time=10, num_node=16, latent_dim_end=4,
                    latent_dim=2, num_filter_enc=[8, 8], n_epochs=6,
                    batch_size=4, alpha=100.0)
    data = synthetic_dataset(8, 10, 16, seed=0)
    scaled, _, _ = data_scaler(data, 10, 16, save_path=None)
    return VAETrainer(cfg, donate=False), scaled


def _poison(trainer, fail_calls):
    """Wrap ``trainer._train_epoch``: loss=NaN on the given 0-based call
    indices (or every call >= fail_calls.start for a range)."""
    orig = trainer._train_epoch
    calls = {"n": 0}

    def fake(state, *args):
        state, m = orig(state, *args)
        i = calls["n"]
        calls["n"] += 1
        if i in fail_calls:
            m = dict(m)
            m["loss"] = jnp.asarray(np.nan, jnp.float32)
        return state, m

    trainer._train_epoch = fake
    return calls


def test_vae_nan_rolls_back_to_checkpoint(tmp_path):
    trainer, scaled = _vae_setup()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=1)
    calls = _poison(trainer, {3})  # epochs 0-2 fine (checkpointed), 3 NaNs

    state, hist = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=6,
                              ckpt_manager=mngr, val_every=10)
    assert int(state.epoch) == 6
    assert len(hist["loss"]) == 6
    assert np.isfinite(hist["loss"]).all()
    assert calls["n"] == 7  # 6 kept epochs + 1 discarded NaN epoch
    mngr.close()


def test_vae_nan_without_checkpoint_raises():
    trainer, scaled = _vae_setup()
    _poison(trainer, {0})
    with pytest.raises(RuntimeError, match="no checkpoint"):
        trainer.fit(scaled, jax.random.PRNGKey(0), epochs=3, val_every=10)


def test_vae_nan_retry_budget_exhausted(tmp_path):
    trainer, scaled = _vae_setup()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=1)
    _poison(trainer, range(2, 100))  # permanent divergence after epoch 1
    with pytest.raises(RuntimeError, match="persisted"):
        trainer.fit(scaled, jax.random.PRNGKey(0), epochs=6,
                    ckpt_manager=mngr, val_every=10,
                    nan_guard_max_retries=2)
    mngr.close()


def test_vae_nan_guard_off_trains_through():
    trainer, scaled = _vae_setup()
    _poison(trainer, {1})
    state, hist = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=3,
                              val_every=10, nan_guard=False)
    assert int(state.epoch) == 3
    assert not np.isfinite(hist["loss"]).all()  # NaN kept, no rollback


def test_cli_flag_parses():
    from simulgen_vae_tpu.cli import build_parser

    assert build_parser().parse_args(["--no_nan_guard"]).no_nan_guard
    assert not build_parser().parse_args([]).no_nan_guard


def _lc_setup():
    rng = np.random.default_rng(0)
    n, d = 16, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    y1 = np.tanh(x @ (rng.standard_normal((d, 8)) * 0.3)).astype(np.float32)
    y2 = np.tanh(x @ (rng.standard_normal((d, 6)) * 0.3)
                 ).astype(np.float32).reshape(n, 2, 3)
    lc = LatentConditioner(latent_conditioner_filter=[16, 16],
                           latent_dim_end=8, input_shape=16, latent_dim=3,
                           size2=2, dropout_rate=0.0)
    trainer = LCTrainer(lc, epochs=5, lr=1e-3, batch_size=8,
                        is_image_data=False)
    return trainer, x, y1, y2


def test_lc_nan_rolls_back_to_checkpoint(tmp_path):
    trainer, x, y1, y2 = _lc_setup()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=1)
    calls = _poison(trainer, {2})

    state, hist = trainer.fit(x, y1, y2, jax.random.PRNGKey(0), epochs=5,
                              ckpt_manager=mngr, val_every=10)
    assert int(state.epoch) == 5
    assert len(hist["loss"]) == 5
    assert np.isfinite(hist["loss"]).all()
    assert calls["n"] == 6
    mngr.close()


def test_lc_nan_without_checkpoint_raises():
    trainer, x, y1, y2 = _lc_setup()
    _poison(trainer, {0})
    with pytest.raises(RuntimeError, match="no checkpoint"):
        trainer.fit(x, y1, y2, jax.random.PRNGKey(0), epochs=3, val_every=10)


class FakeScaler:
    def __init__(self, scale, minv):
        self.scale_ = scale
        self.min_ = minv

    def transform(self, v):
        return v * self.scale_ + self.min_

    def inverse_transform(self, v):
        return (v - self.min_) / self.scale_


def test_e2e_nan_falls_back_to_best_state():
    """Without a checkpoint manager the E2E trainer rolls back to its
    device-resident best-state (finite by construction: a NaN val_loss
    never wins the < comparison)."""
    rng = np.random.default_rng(1)
    n = 16
    x = rng.standard_normal((n, 16)).astype(np.float32)
    y1 = np.tanh(rng.standard_normal((n, 8))).astype(np.float32)
    y2 = np.tanh(rng.standard_normal((n, 2, 3))).astype(np.float32)
    target = rng.standard_normal((n, 10, 16)).astype(np.float32)

    vae = VAE(latent_dim=8, hierarchical_dim=3, num_filter_enc=[8, 8],
              num_filter_dec=[8, 8], num_node=16, num_time=10, small=True)
    key = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": key, "sample": key},
                          jnp.zeros((2, 10, 16)))["params"]
    lc = LatentConditioner([16, 16], 8, 16, 3, 2, dropout_rate=0.0)
    trainer = E2ETrainer(lc, vae, vae_params,
                         latent_scaler=FakeScaler(0.5, 0.1),
                         xs_scaler=FakeScaler(0.5, 0.1),
                         epochs=4, lr=1e-3, batch_size=8)
    calls = _poison(trainer, {2})

    state, hist = trainer.fit(x, y1, y2, target, jax.random.PRNGKey(3),
                              epochs=4)
    assert len(hist["loss"]) == 4
    assert np.isfinite(hist["loss"]).all()
    assert calls["n"] >= 5  # the NaN epoch was discarded and re-run
