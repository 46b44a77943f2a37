"""Gradient checkpointing: identical forward/grad values, training runs."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.dataset import synthetic_dataset
from simulgen_vae_tpu.data.scaler import data_scaler
from simulgen_vae_tpu.train.vae_trainer import VAETrainer


def _cfg(remat):
    return VAEConfig(num_param=8, num_time=10, num_node=24,
                     latent_dim_end=4, latent_dim=2, num_filter_enc=[12, 8],
                     small=True, n_epochs=6, batch_size=4, alpha=100.0,
                     remat=remat)


@pytest.mark.slow
def test_remat_preserves_values():
    data = synthetic_dataset(8, 10, 24, seed=0)
    scaled, _, _ = data_scaler(data, 10, 24, save_path=None)

    t_plain = VAETrainer(_cfg(False), donate=False)
    t_remat = VAETrainer(_cfg(True), donate=False)

    s_plain = t_plain.init_state(jax.random.PRNGKey(0))
    s_remat = t_remat.init_state(jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_remat.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    d = jnp.asarray(scaled)
    s1, m1 = t_plain._train_epoch(s_plain, d, jax.random.PRNGKey(1))
    s2, m2 = t_remat._train_epoch(s_remat, d, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
