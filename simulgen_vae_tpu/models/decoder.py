"""Hierarchical decoder (reference ``modules/decoder.py:84-223``), NWC layout.

Per level i (of ``L-1`` levels, L = len(num_filter_dec)):

* i == 0: ``z_sample = sequence_start(z)`` — Dense ``z -> z*T``, unflatten to
  ``[B, T, z]``, Conv k=5 -> GN -> GELU (decoder.py:131-138).
* i > 0:  ``z_sample = decoder_out + z`` (skip with the previous level's
  sample, decoder.py:179).
* ``DecoderBlock`` (3-tap conv, see blocks.py) + ``DecoderResidualBlock``.
* Between levels (not after the last): prior head ``condition_z`` ->
  (mu, log_var); if hierarchical latents are given, injection head
  ``xs_sequence[i]`` + ``condition_xz`` -> (delta_mu, delta_log_var),
  ``kl_2`` loss, posterior = (mu+delta_mu, log_var+delta_log_var); sample z
  (decoder.py:184-212).  Note the reference consumes only ``xs[0..L-3]``
  even though the encoder emits ``L-1`` hierarchical latents — the last one
  conditions nothing; reproduced faithfully.
* Readout: Conv k=1 ``f_last -> nodes`` + GroupNorm + Tanh
  (decoder.py:117-121).  The k=1 conv is an MXU matmul shardable over nodes.

``mode='fix'`` multiplies std by 1e-10 before the [1e-8, 10] clamp — i.e. an
effectively deterministic decode with std pinned at 1e-8 (decoder.py:202-212).
``frozen_zs`` generalizes the reference's stateful ``freeze_level``/``self.zs``
cache into a functional argument: pass the ``zs`` list returned by a previous
call to reuse those samples.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simulgen_vae_tpu.losses import kl_2
from simulgen_vae_tpu.models.blocks import (
    Conv1d,
    Dense,
    DecoderBlock,
    DecoderResidualBlock,
    FusedPointwiseNormTanh,
    NormAct,
    ResidualBlock,
    gelu,
)


def reparameterize(key: jax.Array, mu: jax.Array, std: jax.Array) -> jax.Array:
    """z = mu + eps*std with std clamped to [1e-8, 10] (decoder.py:218-223)."""
    std = jnp.clip(std, 1e-8, 10.0)
    eps = jax.random.normal(key, std.shape, mu.dtype)
    return mu + eps * std


class _LatentInjector(nn.Module):
    """Dense(h -> h*T) -> [B, T, h] -> Conv k=5 -> GN -> GELU.

    Used for ``sequence_start`` (h = z_dim) and ``xs_sequence`` (h = hier_dim);
    mirrors decoder.py:131-148.  The unflatten follows torch's [B, h, T]
    ordering (channel-major) transposed into our NWC layout.
    """

    latent_dim: int
    features: int
    num_time: int
    small: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v):
        h = Dense(self.latent_dim * self.num_time, self.dtype)(v)
        # torch Unflatten(1, (latent, T)) then conv over T: channel-major.
        h = h.reshape(v.shape[0], self.latent_dim, self.num_time)
        h = jnp.swapaxes(h, 1, 2)  # -> [B, T, latent]
        h = Conv1d(self.features, 5, self.dtype)(h)
        return NormAct(self.features, "gelu", self.dtype)(h)


class _ConditionHead(nn.Module):
    """ResidualBlock -> GELU -> Conv k=3 producing 2*features channels
    (condition_z / condition_xz, decoder.py:150-166)."""

    features: int
    small: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(x.shape[-1], self.small, self.dtype)(x)
        x = gelu(x)
        return Conv1d(2 * self.features, 3, self.dtype)(x)


class Decoder(nn.Module):
    z_dim: int
    hierarchical_dim: int
    num_filter_dec: Sequence[int]
    num_node: int
    num_time: int
    small: bool = True
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, z, xs: Optional[Sequence[jax.Array]] = None,
                 mode: str = "random",
                 frozen_zs: Optional[Sequence[jax.Array]] = None,
                 x_target: Optional[jax.Array] = None,
                 lossfun: str = "MSE"):
        res_cls = (nn.remat(DecoderResidualBlock) if self.remat
                   else DecoderResidualBlock)
        filters = self.num_filter_dec
        n_levels = len(filters) - 1
        kl_losses = []
        zs = []
        decoder_out = None

        for i in range(n_levels):
            if i == 0:
                z_sample = _LatentInjector(
                    self.z_dim, filters[0], self.num_time, self.small,
                    self.dtype, name="sequence_start",
                )(z)
            else:
                z_sample = decoder_out + z

            decoder_out = DecoderBlock(filters[i + 1], self.dtype,
                                       name=f"dec_block_{i}")(z_sample)
            decoder_out = res_cls(filters[i + 1], self.small,
                                  self.dtype,
                                  name=f"dec_res_{i}")(decoder_out)

            if i == n_levels - 1:
                break

            cond = _ConditionHead(filters[i + 1], self.small, self.dtype,
                                  name=f"condition_z_{i}")(decoder_out)
            mu, log_var = jnp.split(cond, 2, axis=-1)

            if xs is not None:
                xs_sample = _LatentInjector(
                    self.hierarchical_dim, filters[i + 1], self.num_time,
                    self.small, self.dtype, name=f"xs_sequence_{i}",
                )(xs[i])
                cond_xz = _ConditionHead(
                    filters[i + 1], self.small, self.dtype,
                    name=f"condition_xz_{i}",
                )(jnp.concatenate([xs_sample, decoder_out], axis=-1))
                delta_mu, delta_log_var = jnp.split(cond_xz, 2, axis=-1)
                kl_losses.append(kl_2(delta_mu, delta_log_var, mu, log_var))
                mu = mu + delta_mu
                log_var = log_var + delta_log_var

            log_var = jnp.clip(log_var, -30.0, 30.0)
            std = jnp.exp(0.5 * log_var)
            if mode == "fix":
                std = std * 1e-10  # clamps to exactly 1e-8 in reparameterize

            if frozen_zs is not None and i < len(frozen_zs):
                z = frozen_zs[i]
            else:
                z = reparameterize(self.make_rng("sample"), mu, std)
            zs.append(z)

        # Readout Conv(k=1) + GroupNorm + Tanh (decoder.py:117-121).  With
        # x_target, the fused Pallas train path returns (loss, mse) means
        # directly (x_hat never materialized).
        out = FusedPointwiseNormTanh(self.num_node, self.dtype,
                                     name="recon")(decoder_out,
                                                   x_target=x_target,
                                                   lossfun=lossfun)
        return out, kl_losses, zs
