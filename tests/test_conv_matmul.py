"""conv1d_same: the shifted-matmul lowering must match lax.conv exactly.

The decoder's k=5 convs at 5120 channels measured ~43% MXU under XLA's TPU
conv emitter; ``blocks.conv1d_same`` re-expresses stride-1 SAME convs as a
sum of k time-shifted dense matmuls (reference op: modules/common.py:127-162
bottleneck convs).  Values and gradients must agree with the conv lowering.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models import blocks


@pytest.mark.parametrize("k", [1, 3, 5])
def test_matmul_conv_matches_lax_conv(k, monkeypatch):
    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.standard_normal((3, 17, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 24, 16)).astype(np.float32) * 0.2)

    monkeypatch.setenv("SIMULGEN_CONV", "conv")
    ref = blocks.conv1d_same(x, w)
    monkeypatch.setenv("SIMULGEN_CONV", "matmul")
    out = blocks.conv1d_same(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_matmul_conv_grads_match(k, monkeypatch):
    rng = np.random.default_rng(10 + k)
    x = jnp.asarray(rng.standard_normal((2, 11, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 8, 12)).astype(np.float32) * 0.3)

    def loss(mode):
        def f(x_, w_):
            import os

            os.environ["SIMULGEN_CONV"] = mode
            y = blocks.conv1d_same(x_, w_)
            return jnp.sum(jnp.tanh(y) ** 2)

        return f

    gx_r, gw_r = jax.grad(loss("conv"), argnums=(0, 1))(x, w)
    gx_m, gw_m = jax.grad(loss("matmul"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_m), np.asarray(gw_r),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_full_vae_matmul_conv_parity(monkeypatch):
    """Whole-model forward: matmul-mode convs == conv-mode convs."""
    from simulgen_vae_tpu.models.vae import VAE

    model = VAE(latent_dim=8, hierarchical_dim=4, num_filter_enc=[16, 8],
                num_filter_dec=[8, 16], num_node=64, num_time=12, small=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 12, 64))
        .astype(np.float32) * 0.3)

    monkeypatch.setenv("SIMULGEN_CONV", "conv")
    p = model.init({"params": key, "sample": key}, x)["params"]
    xh_ref, recon_ref, _, _ = model.apply({"params": p}, x,
                                          rngs={"sample": key})
    monkeypatch.setenv("SIMULGEN_CONV", "matmul")
    xh, recon, _, _ = model.apply({"params": p}, x, rngs={"sample": key})
    np.testing.assert_allclose(np.asarray(xh), np.asarray(xh_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(recon), float(recon_ref), rtol=1e-5)


def test_analytic_readout_with_and_without_sn():
    """analytic=True path: matches the direct path, incl. under an SN
    inv_sigma variable (regression: inv-std shadowed the SN scalar)."""
    from simulgen_vae_tpu.models.blocks import FusedPointwiseNormTanh

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32) * 0.5)

    direct = FusedPointwiseNormTanh(num_node=64, analytic=False)
    analytic = FusedPointwiseNormTanh(num_node=64, analytic=True)
    p = direct.init(jax.random.PRNGKey(1), h)["params"]

    out_d = direct.apply({"params": p}, h)
    out_a = analytic.apply({"params": p}, h)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)

    def with_sigma(mod):
        return mod.apply(
            {"params": p, "sn_sigma": {"inv_sigma": jnp.asarray(0.7)}}, h)

    out_ds = with_sigma(direct)
    out_as = with_sigma(analytic)
    np.testing.assert_allclose(np.asarray(out_as), np.asarray(out_ds),
                               rtol=2e-4, atol=2e-4)
