"""Large (small=False) model variant: torch parity + training smoke.

The CLI's --size=large path (SimulGen-VAE.py:188-195) uses the two-conv
blocks (encoder.py:38-46, common.py:115-122,146-159); most tests use small.
"""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests import torch_oracle as oracle


def to_jax(x):
    return jnp.asarray(x.detach().numpy())


def test_large_conv_block_parity():
    from simulgen_vae_tpu.models.blocks import ConvBlock

    torch.manual_seed(0)
    tblock = oracle.TConvBlock(16, 12, small=False).eval()
    x_t = torch.randn(3, 16, 10)

    params = {"params": {}}
    for j, stage in enumerate(tblock.seq):
        conv_p, gn_p = oracle.cgg_params(stage)
        params["params"][f"Conv1d_{j}"] = conv_p
        params["params"][f"NormAct_{j}"] = gn_p

    fblock = ConvBlock(12, small=False)
    out_f = fblock.apply(params, to_jax(x_t).transpose(0, 2, 1))
    out_t = tblock(x_t).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


def test_large_encoder_residual_parity():
    from simulgen_vae_tpu.models.blocks import EncoderResidualBlock

    torch.manual_seed(1)
    tblock = oracle.TEncoderResidual(8, small=False).eval()
    x_t = torch.randn(2, 8, 10)

    params = {"params": {}}
    for j, stage in enumerate(tblock.seq):
        conv_p, gn_p = oracle.cgg_params(stage)
        params["params"][f"Conv1d_{j}"] = conv_p
        params["params"][f"NormAct_{j}"] = gn_p

    fblock = EncoderResidualBlock(8, small=False)
    out_f = fblock.apply(params, to_jax(x_t).transpose(0, 2, 1))
    out_t = tblock(x_t).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


def test_large_decoder_residual_parity():
    from simulgen_vae_tpu.models.blocks import DecoderResidualBlock

    torch.manual_seed(2)
    tblock = oracle.TDecoderResidual(8, small=False).eval()
    x_t = torch.randn(2, 8, 10)

    params = {"params": {}}
    for j, stage in enumerate(tblock.seq):
        conv_p, gn_p = oracle.cgg_params(stage)
        params["params"][f"Conv1d_{j}"] = conv_p
        params["params"][f"NormAct_{j}"] = gn_p

    fblock = DecoderResidualBlock(8, small=False)
    out_f = fblock.apply(params, to_jax(x_t).transpose(0, 2, 1))
    out_t = tblock(x_t).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


@pytest.mark.slow
def test_large_vae_trains():
    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.data.dataset import synthetic_dataset
    from simulgen_vae_tpu.data.scaler import data_scaler
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    data = synthetic_dataset(8, 10, 24, seed=0)
    scaled, _, _ = data_scaler(data, 10, 24, save_path=None)
    cfg = VAEConfig(num_param=8, num_time=10, num_node=24,
                    latent_dim_end=4, latent_dim=2, num_filter_enc=[12, 8],
                    small=False, n_epochs=6, batch_size=4, alpha=100.0)
    trainer = VAETrainer(cfg, donate=False)
    state, hist = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=4)
    assert np.isfinite(hist["loss"]).all()
