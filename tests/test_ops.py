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


def _tiled_case(b=2, t=6, c=300, g=4, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    return x, scale, bias, g


def test_tiled_kernel_matches_reference(monkeypatch):
    """Two-phase tiled kernel: tiles (128-wide here) cross the 75-wide
    groups and the last tile is padded (300 = 2x128 + 44)."""
    from simulgen_vae_tpu.ops import groupnorm_gelu as gg

    monkeypatch.setattr(gg, "VMEM_BLOCK_BYTES", 6 * 128 * 4)  # ct=128
    x, scale, bias, g = _tiled_case()
    for act in ("gelu", "tanh", "none"):
        ref = gg.group_norm_gelu_reference(x, scale, bias, g, act=act)
        out = gg.tiled_group_norm_gelu(x, scale, bias, g, 1e-5, act)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=act)


def test_tiled_kernel_grad_matches_reference(monkeypatch):
    from simulgen_vae_tpu.ops import groupnorm_gelu as gg

    monkeypatch.setattr(gg, "VMEM_BLOCK_BYTES", 6 * 128 * 4)
    x, scale, bias, g = _tiled_case(seed=4)

    def loss_tiled(a, s, b):
        return jnp.sum(gg.tiled_group_norm_gelu(a, s, b, g, 1e-5, "tanh") ** 2)

    def loss_ref(a, s, b):
        return jnp.sum(
            gg.group_norm_gelu_reference(a, s, b, g, act="tanh") ** 2)

    ga = jax.grad(loss_tiled, argnums=(0, 1, 2))(x, scale, bias)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_tiled_dispatch_for_large_maps(monkeypatch):
    """Maps over the direct-kernel VMEM cap route to the tiled kernel."""
    from simulgen_vae_tpu.ops import groupnorm_gelu as gg

    monkeypatch.setattr(gg, "VMEM_BLOCK_BYTES", 6 * 128 * 4)
    x, scale, bias, g = _tiled_case(seed=5)
    assert not gg.pallas_supported(x.shape[1], x.shape[2])
    out = gg.group_norm_gelu(x, scale, bias, g, use_pallas=True)
    ref = gg.group_norm_gelu_reference(x, scale, bias, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tiled_flagship_group_geometry():
    """Scaled flagship shape: C not 128-divisible, group width 11876-style
    odd (here 2969-wide groups = the flagship's prime factor)."""
    from simulgen_vae_tpu.ops import groupnorm_gelu as gg

    rng = np.random.default_rng(6)
    b, t, c, g = 1, 4, 2969 * 4, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    scale = jnp.ones(c, jnp.float32)
    bias = jnp.zeros(c, jnp.float32)
    ref = gg.group_norm_gelu_reference(x, scale, bias, g, act="tanh")
    out = gg.tiled_group_norm_gelu(x, scale, bias, g, 1e-5, "tanh")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
