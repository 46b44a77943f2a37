"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.dataset import synthetic_dataset
from simulgen_vae_tpu.data.scaler import data_scaler
from simulgen_vae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_state,
)
from simulgen_vae_tpu.parallel.sharding import shard_batch
from simulgen_vae_tpu.train.vae_trainer import VAETrainer


def small_cfg(**kw):
    defaults = dict(
        num_param=16, num_time=12, num_node=32,
        latent_dim_end=8, latent_dim=4,
        num_filter_enc=[16, 8], small=True,
        n_epochs=10, batch_size=8, lr=1e-3, alpha=100.0,
    )
    defaults.update(kw)
    return VAEConfig(**defaults)


def test_make_mesh_shapes():
    mesh = make_mesh()  # all 8 devices on data
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(model=3)


def test_param_sharding_rules():
    mesh = make_mesh(model=2)
    cfg = small_cfg()
    trainer = VAETrainer(cfg)
    # eval_shape: sharding rules only need the param tree structure, not
    # materialized weights — skips the init compile on this 1-core host.
    state = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
    sh = param_shardings(state.params, mesh, cfg.num_node)

    from flax import traverse_util

    flat_p = traverse_util.flatten_dict(state.params)
    flat_s = traverse_util.flatten_dict(sh)
    emb = flat_s[("encoder", "enc_block_0", "Conv1d_0", "Conv_0", "kernel")]
    assert emb.spec == jax.sharding.PartitionSpec(None, "model", None)
    readout = flat_s[("decoder", "recon", "kernel")]
    assert readout.spec == jax.sharding.PartitionSpec(None, "model")
    # GroupNorm over nodes sharded too
    rn = flat_s[("decoder", "recon", "scale")]
    assert rn.spec == jax.sharding.PartitionSpec("model")
    # ordinary kernels replicated
    other = flat_s[("encoder", "enc_block_1", "Conv1d_0", "Conv_0", "kernel")]
    assert other.spec == jax.sharding.PartitionSpec(None, None, None)


def _train_two_epochs(mesh, data, cfg, donate=False):
    trainer = VAETrainer(cfg, donate=donate)
    state = trainer.init_state(jax.random.PRNGKey(0))
    if mesh is not None:
        state = shard_state(state, mesh, cfg.num_node)
        data = shard_batch(jnp.asarray(data), mesh)
    else:
        data = jnp.asarray(data)
    for i in range(2):
        state, metrics = trainer._train_epoch(state, data,
                                              jax.random.PRNGKey(42 + i))
    return state, metrics


@pytest.fixture(scope="module")
def scaled():
    data = synthetic_dataset(16, 12, 32, seed=0)
    return data_scaler(data, 12, 32, save_path=None)[0]


@pytest.mark.slow
def test_dp_matches_single_device(scaled):
    """Data-parallel training over 8 devices produces the same params as
    single-device (GSPMD is math-preserving)."""
    cfg = small_cfg()
    mesh = make_mesh()  # 8-way data parallel
    s_single, m_single = _train_two_epochs(None, scaled, cfg)
    s_mesh, m_mesh = _train_two_epochs(mesh, scaled, cfg)

    leaves_a = jax.tree.leaves(s_single.params)
    leaves_b = jax.tree.leaves(s_mesh.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(float(m_single["loss"]), float(m_mesh["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_model_axis_sharding_matches(scaled):
    """data x model (4x2) mesh training matches single-device numerically."""
    cfg = small_cfg()
    mesh = make_mesh(model=2)
    s_single, _ = _train_two_epochs(None, scaled, cfg)
    s_mesh, _ = _train_two_epochs(mesh, scaled, cfg)
    # cross-shard reduction order perturbs group statistics at the ulp level;
    # tolerance covers two optimizer steps of amplification.
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_sharded_state_layout(scaled):
    cfg = small_cfg()
    mesh = make_mesh(model=2)
    trainer = VAETrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = shard_state(state, mesh, cfg.num_node)
    emb = state.params["encoder"]["enc_block_0"]["Conv1d_0"]["Conv_0"]["kernel"]
    # node axis (dim 1, size 32) split over 2 model shards -> 16 each
    shard_shapes = {s.data.shape for s in emb.addressable_shards}
    assert shard_shapes == {(1, 16, 16)}
