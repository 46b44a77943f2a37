"""Pallas fused GroupNorm+GELU kernel: parity + gradients (interpret mode)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.ops.groupnorm_gelu import (
    fused_group_norm_gelu,
    group_norm_gelu,
    group_norm_gelu_reference,
)


def _case(b=2, t=8, c=24, g=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    return x, scale, bias, g


def test_reference_matches_torch():
    x, scale, bias, g = _case()
    ref = group_norm_gelu_reference(x, scale, bias, g)

    tx = torch.tensor(np.asarray(x)).permute(0, 2, 1)  # [B, C, T]
    gn = torch.nn.GroupNorm(g, x.shape[-1])
    gn.weight.data = torch.tensor(np.asarray(scale))
    gn.bias.data = torch.tensor(np.asarray(bias))
    out_t = torch.nn.functional.gelu(gn(tx)).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(ref), out_t, atol=1e-5)


def test_pallas_kernel_matches_reference():
    x, scale, bias, g = _case()
    ref = group_norm_gelu_reference(x, scale, bias, g)
    out = fused_group_norm_gelu(x, scale, bias, g)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_unaligned_group():
    # group size 11876-style non-128-aligned slices (here 10)
    x, scale, bias, g = _case(b=1, t=4, c=20, g=2, seed=1)
    ref = group_norm_gelu_reference(x, scale, bias, g)
    out = fused_group_norm_gelu(x, scale, bias, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_custom_vjp_matches_reference_grad():
    x, scale, bias, g = _case(seed=2)

    def loss_fused(a, s, b):
        return jnp.sum(fused_group_norm_gelu(a, s, b, g) ** 2)

    def loss_ref(a, s, b):
        return jnp.sum(group_norm_gelu_reference(a, s, b, g) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dispatch_helper():
    x, scale, bias, g = _case(seed=3)
    a = group_norm_gelu(x, scale, bias, g, use_pallas=False)
    b = group_norm_gelu(x, scale, bias, g, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
