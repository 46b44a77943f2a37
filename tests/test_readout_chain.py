"""Fused readout-chain op (matmul+GN+tanh+loss): parity vs the XLA
composition, values AND gradients, interpret mode (hardware probe:
scripts/probe_readout_chain.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.ops.readout_chain import (
    readout_chain_loss,
    readout_chain_loss_reference,
)


def _case(b=2, t=6, f=16, c=300, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)) * 0.3
    kernel = jnp.asarray(rng.standard_normal((f, c)).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.1
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    nb = jnp.asarray(rng.standard_normal(c).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32)) * 0.5
    return h, kernel, bias, scale, nb, x


@pytest.mark.parametrize("lossfun", ["MSE", "MAE", "Huber", "smoothL1"])
def test_forward_matches_reference(lossfun):
    h, kernel, bias, scale, nb, x = _case()
    inv = jnp.asarray(0.8, jnp.float32)
    g = 4
    la, ma = readout_chain_loss(h, kernel, bias, scale, nb, x, inv, g,
                                1e-5, lossfun)
    lb, mb = readout_chain_loss_reference(h, kernel, bias, scale, nb, x,
                                          inv, g, 1e-5, lossfun)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    np.testing.assert_allclose(float(ma), float(mb), rtol=1e-5)


def test_gradients_match_reference():
    h, kernel, bias, scale, nb, x = _case(seed=1)
    inv = jnp.asarray(1.3, jnp.float32)
    g = 4

    def loss_fused(h_, k_, b_, s_, nb_, inv_):
        l, m = readout_chain_loss(h_, k_, b_, s_, nb_, x, inv_, g, 1e-5,
                                  "MSE")
        return 3.0 * l + 0.5 * m  # exercise both cotangents

    def loss_ref(h_, k_, b_, s_, nb_, inv_):
        l, m = readout_chain_loss_reference(h_, k_, b_, s_, nb_, x, inv_, g,
                                            1e-5, "MSE")
        return 3.0 * l + 0.5 * m

    ga = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        h, kernel, bias, scale, nb, inv)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        h, kernel, bias, scale, nb, inv)
    names = ["dh", "dW", "dbias", "dscale", "dnorm_bias", "dinv_sigma"]
    for name, a, b_ in zip(names, ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_vae_fused_path_matches_unfused():
    """Full VAE: fused_readout_loss=True returns the same recon losses and
    parameter gradients as the standard path."""
    from simulgen_vae_tpu.models.vae import VAE

    model = VAE(latent_dim=4, hierarchical_dim=2, num_filter_enc=[8, 8],
                num_filter_dec=[8, 8], num_node=24, num_time=6, small=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 24)) * 0.3
    params = model.init({"params": key, "sample": key}, x)["params"]

    def loss(p, fused):
        _, recon, kls, mse = model.apply(
            {"params": p}, x, fused_readout_loss=fused,
            rngs={"sample": jax.random.PRNGKey(7)})
        return 100.0 * recon + sum(kls) + 0.1 * mse

    la, ga = jax.value_and_grad(lambda p: loss(p, False))(params)
    lb, gb = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.slow
def test_vae_fused_path_with_sn_sigma():
    """Fused path composes with the output-scaling spectral norm."""
    from simulgen_vae_tpu.models.spectral_norm import (
        compute_sigmas,
        init_sn_state,
    )
    from simulgen_vae_tpu.models.vae import VAE

    model = VAE(latent_dim=4, hierarchical_dim=2, num_filter_enc=[8, 8],
                num_filter_dec=[8, 8], num_node=24, num_time=6, small=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 24)) * 0.3
    params = model.init({"params": key, "sample": key}, x)["params"]
    sn_u = init_sn_state(params, jax.random.PRNGKey(2))

    def loss(p, fused):
        sig, _ = compute_sigmas(p, sn_u)
        _, recon, kls, _ = model.apply(
            {"params": p, "sn_sigma": sig}, x, fused_readout_loss=fused,
            rngs={"sample": jax.random.PRNGKey(7)})
        return 100.0 * recon + sum(kls)

    la, ga = jax.value_and_grad(lambda p: loss(p, False))(params)
    lb, gb = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_backward_modes_agree(monkeypatch):
    """The round-5 fused backward (dW/dh contracted inside the dy pass,
    dy never materialized) must match the materializing backward on every
    gradient, including tile-boundary-crossing group widths."""
    import simulgen_vae_tpu.ops.readout_chain as rc

    # c=1100 keeps the rounded C-tile >= 1024 so the fused backward actually
    # engages (readout_chain._fused_bwd_tile's measured engage rule).
    h, kernel, bias, scale, nb, x = _case(b=3, t=5, f=16, c=1100, seed=3)
    inv = jnp.asarray(0.7, jnp.float32)
    g = 4  # 275-wide groups cross the 128-lane tiles

    def loss(h_, k_, b_, s_, nb_, inv_):
        l, m = readout_chain_loss(h_, k_, b_, s_, nb_, x, inv_, g, 1e-5,
                                  "Huber")
        return 2.0 * l + 0.3 * m

    monkeypatch.delenv("SIMULGEN_READOUT_BWD", raising=False)
    assert rc.bwd_flavor(3, 5, 16, 1100) == "fused"  # not a vacuous compare

    grads = {}
    for mode in ("fused", "materialize"):
        monkeypatch.setenv("SIMULGEN_READOUT_BWD", mode)
        grads[mode] = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            h, kernel, bias, scale, nb, inv)
    for name, a, b_ in zip(["dh", "dW", "dbias", "dscale", "dnb", "dinv"],
                           grads["fused"], grads["materialize"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=1e-6, err_msg=name)


def test_bwd_flavor_engage_rule(monkeypatch):
    """The measured engage rule (PERF.md 'Readout backward fusion'): fused
    only where a >=1024-wide C-tile fits VMEM next to the resident dh
    block; flagship train geometry and narrow-tile cases fall back."""
    import simulgen_vae_tpu.ops.readout_chain as rc

    monkeypatch.delenv("SIMULGEN_READOUT_BWD", raising=False)
    # flagship: 26 MB dh block can never fit
    assert rc.bwd_flavor(16, 200, 1024, 95008) == "materialize (vmem fallback)"
    # b=4 at flagship width: fits only at ctf=256 -> measured loser, vetoed
    assert rc.bwd_flavor(4, 200, 1024, 95008) == "materialize (vmem fallback)"
    # small geometry: ctf=2048 -> measured 12% win
    assert rc.bwd_flavor(4, 200, 128, 5120) == "fused"
    # explicit opt-out wins over everything
    monkeypatch.setenv("SIMULGEN_READOUT_BWD", "materialize")
    assert rc.bwd_flavor(4, 200, 128, 5120) == "materialize"
