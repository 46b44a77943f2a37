"""Preemption safety: SIGTERM → checkpoint at the epoch boundary → resume.

The reference has no failure-recovery story (it saves weights once, at the
very end — ``modules/train.py:252-253``); here a cooperative stop flag
(``utils/preemption.py``) makes every trainer checkpoint its full state and
return early, so a requeued run continues exactly where it stopped.
"""

import os
import signal

import numpy as np
import pytest

import jax

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.dataset import synthetic_dataset
from simulgen_vae_tpu.data.scaler import data_scaler
from simulgen_vae_tpu.train.vae_trainer import VAETrainer
from simulgen_vae_tpu.utils import preemption
from simulgen_vae_tpu.utils.checkpoint import CheckpointManager


@pytest.fixture(autouse=True)
def _clean_flag():
    preemption.clear()
    yield
    preemption.uninstall()


def test_sigterm_sets_flag_once_then_chains():
    preemption.install()
    assert not preemption.requested()
    os.kill(os.getpid(), signal.SIGTERM)
    assert preemption.requested()  # handler ran between bytecodes
    assert preemption.exit_code() == preemption.EX_TEMPFAIL
    preemption.uninstall()
    assert not preemption.requested()
    assert preemption.exit_code() == 0


def test_install_is_idempotent():
    preemption.install()
    preemption.install()
    os.kill(os.getpid(), signal.SIGTERM)
    assert preemption.requested()


def test_vae_fit_stops_checkpoints_and_resumes(tmp_path):
    data = synthetic_dataset(12, 10, 32, seed=0)
    scaled, _, _ = data_scaler(data, 10, 32, save_path=None)
    cfg = VAEConfig(num_param=12, num_time=10, num_node=32,
                    latent_dim_end=8, latent_dim=4, num_filter_enc=[16, 8],
                    n_epochs=12, batch_size=4, alpha=100.0)
    trainer = VAETrainer(cfg, donate=False)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=50)

    def log_fn(epoch, metrics):
        if epoch == 3:
            preemption.request()  # what the SIGTERM handler would do

    state, hist = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=12,
                              ckpt_manager=mngr, val_every=2, log_fn=log_fn)
    mngr.wait()
    stopped_at = int(state.epoch)
    assert stopped_at < 12  # returned early
    assert len(hist["loss"]) == stopped_at
    # the full train state landed on disk despite the 50-epoch interval
    assert mngr.latest_step() == stopped_at

    # a requeued run resumes from exactly the stopped epoch
    preemption.clear()
    trainer2 = VAETrainer(cfg, donate=False)
    restored = mngr.restore(trainer2.init_state(jax.random.PRNGKey(9)))
    assert int(restored.epoch) == stopped_at
    state2, hist2 = trainer2.fit(scaled, jax.random.PRNGKey(1),
                                 state=restored, epochs=12 - stopped_at,
                                 val_every=10)
    assert int(state2.epoch) == 12
    assert np.isfinite(hist2["loss"]).all()
    mngr.close()


def test_preempted_save_on_interval_epoch_does_not_double_save(tmp_path):
    """maybe_save(force=True) after an interval save of the same step is a
    no-op, not an orbax StepAlreadyExists error."""
    data = synthetic_dataset(8, 10, 16, seed=1)
    scaled, _, _ = data_scaler(data, 10, 16, save_path=None)
    cfg = VAEConfig(num_param=8, num_time=10, num_node=16,
                    latent_dim_end=4, latent_dim=2, num_filter_enc=[8, 8],
                    n_epochs=8, batch_size=4, alpha=10.0)
    trainer = VAETrainer(cfg, donate=False)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_epochs=2)

    def log_fn(epoch, metrics):
        if epoch == 1:  # stop right when state.epoch == 2, an interval epoch
            preemption.request()

    state, _ = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=8,
                           ckpt_manager=mngr, val_every=2, log_fn=log_fn)
    mngr.wait()
    assert mngr.latest_step() == int(state.epoch)
    mngr.close()


def test_e2e_fit_stops_and_normal_path_intact(tmp_path):
    """E2E fit returns the CURRENT state on preemption, and still returns
    the best-tracked state on a normal (non-preempted) run."""
    import jax.numpy as jnp

    from simulgen_vae_tpu.models import LatentConditioner, VAE
    from simulgen_vae_tpu.train.lc_e2e_trainer import E2ETrainer

    class FakeScaler:
        scale_, min_ = 0.5, 0.1

        def transform(self, v):
            return v * self.scale_ + self.min_

        def inverse_transform(self, v):
            return (v - self.min_) / self.scale_

    filters = [8, 8]
    vae = VAE(latent_dim=8, hierarchical_dim=3, num_filter_enc=filters,
              num_filter_dec=filters[::-1], num_node=16, num_time=10,
              small=True)
    key = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": key, "sample": key},
                          jnp.zeros((2, 10, 16)))["params"]
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 16)).astype(np.float32)
    y1 = rng.standard_normal((16, 8)).astype(np.float32)
    y2 = rng.standard_normal((16, 2, 3)).astype(np.float32)
    target = rng.standard_normal((16, 10, 16)).astype(np.float32)
    lc = LatentConditioner([16, 16], 8, 16, 3, 2, dropout_rate=0.1)

    def make_trainer():
        return E2ETrainer(lc, vae, vae_params, latent_scaler=FakeScaler(),
                          xs_scaler=FakeScaler(), epochs=6, lr=1e-3,
                          batch_size=8, loss_function="Huber", lc_alpha=10.0)

    # normal run: completes all epochs (regression guard for the
    # best-state return path)
    state, hist = make_trainer().fit(x, y1, y2, target,
                                     jax.random.PRNGKey(3), epochs=6)
    assert len(hist["loss"]) == 6

    # preempted run: stops early and checkpoints the current state
    mngr = CheckpointManager(str(tmp_path / "e2e"), save_interval_epochs=100)

    def log_fn(epoch, metrics):
        if epoch == 2:
            preemption.request()

    state, hist = make_trainer().fit(x, y1, y2, target,
                                     jax.random.PRNGKey(3), epochs=6,
                                     ckpt_manager=mngr, log_fn=log_fn)
    mngr.wait()
    assert len(hist["loss"]) == 3
    assert mngr.latest_step() == int(state.epoch)
    mngr.close()


def test_lc_fit_stops_and_checkpoints(tmp_path):
    from simulgen_vae_tpu.models import LatentConditioner
    from simulgen_vae_tpu.train.lc_trainer import LCTrainer

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 4)).astype(np.float32)
    y1 = rng.standard_normal((16, 8)).astype(np.float32)
    y2 = rng.standard_normal((16, 3, 4)).astype(np.float32)
    model = LatentConditioner(latent_conditioner_filter=[16, 16],
                              latent_dim_end=8, input_shape=4,
                              latent_dim=4, size2=3, dropout_rate=0.1)
    trainer = LCTrainer(model, epochs=20, lr=1e-3, batch_size=8,
                        is_image_data=False)
    mngr = CheckpointManager(str(tmp_path / "lc"), save_interval_epochs=100)

    def log_fn(epoch, metrics):
        if epoch == 4:
            preemption.request()

    state, hist = trainer.fit(x, y1, y2, jax.random.PRNGKey(0),
                              ckpt_manager=mngr, log_fn=log_fn)
    mngr.wait()
    assert int(state.epoch) == 5  # stopped right after epoch index 4
    assert mngr.latest_step() == 5
    mngr.close()
