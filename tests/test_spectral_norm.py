"""Spectral-norm parity with torch and convergence properties."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models.spectral_norm import (
    init_sn_state,
    spectral_normalize,
)


def test_converges_to_true_sigma():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((20, 12)).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w), "bias": jnp.zeros(12)}}
    state = init_sn_state(params, jax.random.PRNGKey(0))

    for _ in range(50):
        normed, state = spectral_normalize(params, state)

    sigma_true = np.linalg.svd(w, compute_uv=False)[0]
    w_normed = np.asarray(normed["layer"]["kernel"])
    np.testing.assert_allclose(w_normed * sigma_true, w, rtol=1e-4)
    # leading singular value of normalized weight ~ 1
    np.testing.assert_allclose(
        np.linalg.svd(w_normed, compute_uv=False)[0], 1.0, rtol=1e-4
    )


def test_torch_parity_single_iteration():
    """With torch's u vector transplanted, one power iteration matches."""
    torch.manual_seed(0)
    lin = torch.nn.Linear(12, 20)
    w = lin.weight.detach().numpy().copy()  # [out=20, in=12]
    snlin = torch.nn.utils.spectral_norm(lin)

    # torch stores u in R^out for the [out, in] view.
    u_torch = snlin.weight_u.detach().numpy().copy()

    # Our kernel is [in, out]; our M = reshape(-1, out) = [in, out] = W^T,
    # and our u is in R^out — same vector as torch's u.
    params = {"l": {"kernel": jnp.asarray(w.T)}}
    state = {"l": {"kernel": jnp.asarray(u_torch)}}

    normed, new_state = spectral_normalize(params, state)

    with torch.no_grad():
        w_t = snlin.weight.detach().numpy()  # triggers one power iteration? no
    # force one power-iteration by calling forward in train mode
    snlin.train()
    _ = snlin(torch.zeros(1, 12))
    w_t = snlin.weight.detach().numpy()

    np.testing.assert_allclose(
        np.asarray(normed["l"]["kernel"]).T, w_t, rtol=1e-4, atol=1e-6
    )


def test_gradient_flows_through_sigma():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    params = {"l": {"kernel": w}}
    state = init_sn_state(params, jax.random.PRNGKey(0))
    # converge u first
    for _ in range(30):
        _, state = spectral_normalize(params, state)

    def loss(p):
        normed, _ = spectral_normalize(p, state, update=False)
        return jnp.sum(normed["l"]["kernel"] ** 2)

    g = jax.grad(loss)(params)["l"]["kernel"]
    # ||W/sigma||_F^2 is scale-invariant: grad dotted with W should be ~0
    # (d/dt ||tW/sigma(tW)||^2 = 0), a property torch SN shares.
    directional = jnp.sum(g * w)
    assert abs(float(directional)) < 1e-4
    assert float(jnp.abs(g).max()) > 0  # but grads are not identically zero


def test_filter_fn_selects_paths():
    params = {
        "sn_conv": {"kernel": jnp.ones((3, 4))},
        "plain": {"kernel": jnp.ones((3, 4))},
    }
    state = init_sn_state(
        params, jax.random.PRNGKey(0),
        filter_fn=lambda path: any(str(p).startswith("sn_") for p in path),
    )
    normed, _ = spectral_normalize(params, state)
    assert not np.allclose(np.asarray(normed["sn_conv"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(normed["plain"]["kernel"]), 1.0)


def test_bias_and_vectors_untouched():
    params = {"l": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)}}
    state = init_sn_state(params, jax.random.PRNGKey(0))
    normed, _ = spectral_normalize(params, state)
    np.testing.assert_allclose(np.asarray(normed["l"]["bias"]), 1.0)


def test_bf16_compute_dtype_path():
    """bf16 SN path: sigma accuracy within bf16 tolerance, output dtype bf16."""
    rng = np.random.default_rng(4)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    params = {"l": {"kernel": jnp.asarray(w)}}
    state = init_sn_state(params, jax.random.PRNGKey(0))
    for _ in range(40):
        _, state = spectral_normalize(params, state)

    f32, _ = spectral_normalize(params, state, update=False)
    bf16, _ = spectral_normalize(params, state, update=False,
                                 compute_dtype=jnp.bfloat16)
    assert bf16["l"]["kernel"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf16["l"]["kernel"], dtype=np.float32),
        np.asarray(f32["l"]["kernel"]), atol=2e-2, rtol=2e-2)
