"""Spectral-norm parity with torch and convergence properties."""

import numpy as np
import torch

import pytest
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


def test_compute_sigmas_matches_materializing_sigma():
    """compute_sigmas' sigma (=||M^T v||) equals spectral_normalize's
    (=v.M u_new) — same power-iteration state, same value."""
    from simulgen_vae_tpu.models.spectral_norm import compute_sigmas

    rng = np.random.default_rng(7)
    w = rng.standard_normal((24, 10)).astype(np.float32)
    params = {"l": {"kernel": jnp.asarray(w)}}
    state = init_sn_state(params, jax.random.PRNGKey(3))

    normed, u_a = spectral_normalize(params, state)
    sig, u_b = compute_sigmas(params, state)

    sigma_mat = float(w[0, 0] / np.asarray(normed["l"]["kernel"])[0, 0])
    sigma_new = 1.0 / float(sig["l"]["inv_sigma"])
    np.testing.assert_allclose(sigma_new, sigma_mat, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_a["l"]["kernel"]),
                               np.asarray(u_b["l"]["kernel"]), rtol=1e-5)


@pytest.mark.slow
def test_output_scaling_sn_matches_materializing_in_model():
    """Full VAE forward + gradients: params materialized as W/sigma vs the
    sn_sigma output-scaling collection give the same outputs and grads."""
    from simulgen_vae_tpu.models.spectral_norm import compute_sigmas
    from simulgen_vae_tpu.models.vae import VAE

    model = VAE(latent_dim=4, hierarchical_dim=2, num_filter_enc=[8, 8],
                num_filter_dec=[8, 8], num_node=16, num_time=10, small=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 16)) * 0.3
    params = model.init({"params": key, "sample": key}, x)["params"]
    sn_u = init_sn_state(params, jax.random.PRNGKey(2))

    def loss_mat(p):
        normed, _ = spectral_normalize(p, sn_u)
        _, recon, kls, _ = model.apply({"params": normed}, x,
                                       rngs={"sample": jax.random.PRNGKey(5)})
        return 100.0 * recon + sum(kls)

    def loss_scale(p):
        sig, _ = compute_sigmas(p, sn_u)
        _, recon, kls, _ = model.apply({"params": p, "sn_sigma": sig}, x,
                                       rngs={"sample": jax.random.PRNGKey(5)})
        return 100.0 * recon + sum(kls)

    la, ga = jax.value_and_grad(loss_mat)(params)
    lb, gb = jax.value_and_grad(loss_scale)(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    # rtol covers float reassociation: the readout applies inv on its
    # input side ((h*inv)@W vs (h@W)*inv — same math, different rounding).
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=8e-4, atol=1e-6)


def test_analytic_rank1_sigma_grads_match_autodiff():
    """Gradients via (stop-grad sigma + analytic rank-1 add) equal autodiff
    through the power iteration (the trainer path since round 3 — avoids
    materializing full outer-product tensors at flagship scale)."""
    from simulgen_vae_tpu.models.spectral_norm import (
        add_sigma_rank1_grads,
        compute_sigmas,
    )
    from simulgen_vae_tpu.models.vae import VAE

    model = VAE(latent_dim=4, hierarchical_dim=2, num_filter_enc=[8, 8],
                num_filter_dec=[8, 8], num_node=16, num_time=10, small=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 16)) * 0.3
    params = model.init({"params": key, "sample": key}, x)["params"]
    sn_u = init_sn_state(params, jax.random.PRNGKey(2))

    def apply_loss(p, sig):
        _, recon, kls, _ = model.apply({"params": p, "sn_sigma": sig}, x,
                                       rngs={"sample": jax.random.PRNGKey(5)})
        return 100.0 * recon + sum(kls)

    def loss_autodiff(p):
        sig, _ = compute_sigmas(p, sn_u)
        return apply_loss(p, sig)

    la, ga = jax.value_and_grad(loss_autodiff)(params)

    sig, _, factors = compute_sigmas(params, sn_u, with_grad_factors=True)
    lb, (gp, gs) = jax.value_and_grad(apply_loss, argnums=(0, 1))(params, sig)
    gb = add_sigma_rank1_grads(gp, gs, factors)

    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    assert flat_a and len(flat_a) == len(flat_b)
    for k, a in flat_a:
        b = flat_b[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_cross_shape_padded_buckets_exact():
    """Zero-row-padded cross-shape bucketing (round 4) returns the SAME
    sigmas, u updates, and rank-1 factors as independent per-kernel
    computation — padding rows of M with zeros is exact for power
    iteration."""
    from simulgen_vae_tpu.models import spectral_norm as sn
    from simulgen_vae_tpu.models.spectral_norm import compute_sigmas

    rng = np.random.default_rng(13)
    # same out-dim, different row counts -> lands in one padded bucket;
    # plus a second out-dim group and a singleton.
    shapes = {"a": (48, 16), "b": (20, 16), "c": (7, 16),
              "d": (30, 24), "e": (9, 24), "f": (11, 5)}
    params = {k: {"kernel": jnp.asarray(
        rng.standard_normal(s).astype(np.float32))} for k, s in shapes.items()}
    state = init_sn_state(params, jax.random.PRNGKey(9))

    sig_b, u_b, fac_b = compute_sigmas(params, state, with_grad_factors=True)

    # force singleton groups by disabling padding
    orig = sn._PAD_BUCKET_MAX_ELEMS
    sn._PAD_BUCKET_MAX_ELEMS = 0
    try:
        sig_s, u_s, fac_s = compute_sigmas(params, state,
                                           with_grad_factors=True)
    finally:
        sn._PAD_BUCKET_MAX_ELEMS = orig

    for k, s in shapes.items():
        np.testing.assert_allclose(
            np.asarray(sig_b[k]["inv_sigma"]),
            np.asarray(sig_s[k]["inv_sigma"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(u_b[k]["kernel"]),
                                   np.asarray(u_s[k]["kernel"]), rtol=1e-5, atol=1e-6)
        path = (k, "kernel")
        for t_b, t_s in zip(fac_b[path], fac_s[path]):
            assert t_b.shape == t_s.shape
            np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_s),
                                       rtol=1e-5, atol=1e-6)
        assert fac_b[path][0].shape == (s[0],)  # row factor sliced to true R

    # eval mode (sigma = ||M u||) must agree too
    sig_eb, _ = compute_sigmas(params, state, update=False)
    sn._PAD_BUCKET_MAX_ELEMS = 0
    try:
        sig_es, _ = compute_sigmas(params, state, update=False)
    finally:
        sn._PAD_BUCKET_MAX_ELEMS = orig
    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(sig_eb[k]["inv_sigma"]),
            np.asarray(sig_es[k]["inv_sigma"]), rtol=1e-5, atol=1e-6)


def test_bucket_entries_waste_bound():
    """_bucket_entries never mixes row counts differing by more than the
    waste factor, and keeps big kernels in exact same-shape groups."""
    from simulgen_vae_tpu.models import spectral_norm as sn

    mk = lambda r, o: jnp.zeros((r, o))
    entries = [(("k%d" % i,), mk(r, 16), jnp.zeros((16,)))
               for i, r in enumerate([4096, 1024, 512, 500, 8])]
    # a "big" kernel (above the pad threshold) with the same out-dim
    big = (("big",), jnp.zeros((sn._PAD_BUCKET_MAX_ELEMS // 16 + 1, 16)),
           jnp.zeros((16,)))
    buckets = sn._bucket_entries(entries + [big])
    for b in buckets:
        rs = [e[1].shape[0] for e in b]
        assert max(rs) <= min(rs) * sn._PAD_WASTE_FACTOR
    # big kernel is alone in its group
    assert any(len(b) == 1 and b[0][0] == ("big",) for b in buckets)
    # the tiny (8-row) kernel must not share a bucket with the 4096-row one
    for b in buckets:
        rs = [e[1].shape[0] for e in b]
        assert not (8 in rs and 4096 in rs)


def test_analytic_rank1_sigma_grads_eval_mode():
    """update=False factors (sigma = ||M u||) also match autodiff."""
    from simulgen_vae_tpu.models.spectral_norm import (
        add_sigma_rank1_grads,
        compute_sigmas,
    )

    rng = np.random.default_rng(11)
    w = rng.standard_normal((24, 10)).astype(np.float32)
    params = {"l": {"kernel": jnp.asarray(w)}}
    sn_u = init_sn_state(params, jax.random.PRNGKey(3))

    def loss_from_sig(p, sig):
        # arbitrary smooth function of inv_sigma and the kernel
        return (jnp.sum(p["l"]["kernel"] ** 2) * sig["l"]["inv_sigma"])

    def loss_autodiff(p):
        sig, _ = compute_sigmas(p, sn_u, update=False)
        return loss_from_sig(p, sig)

    la, ga = jax.value_and_grad(loss_autodiff)(params)

    sig, _, factors = compute_sigmas(params, sn_u, update=False,
                                     with_grad_factors=True)
    lb, (gp, gs) = jax.value_and_grad(loss_from_sig, argnums=(0, 1))(
        params, sig)
    gb = add_sigma_rank1_grads(gp, gs, factors)

    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga["l"]["kernel"]),
                               np.asarray(gb["l"]["kernel"]),
                               rtol=1e-5, atol=1e-7)
