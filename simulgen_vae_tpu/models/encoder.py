"""Hierarchical encoder (reference ``modules/encoder.py:96-166``), NWC layout.

Input ``x``: ``[batch, time, nodes]``.  The first ConvBlock's k=1 conv is the
``nodes -> f0`` embedding — a single ``[B*T, nodes] x [nodes, f0]`` MXU matmul
(~97M params at full scale); its kernel is the tensor to shard over the model
mesh axis (see ``parallel/sharding.py``).

Per level i: ``EncoderBlock`` (one ConvBlock here: channel lists in the
reference are always pairs, encoder.py:119-124) + ``EncoderResidualBlock``;
a per-level Linear ``f_i*T -> hierarchical_dim`` produces the hierarchical
latent.  The final Linear ``f_last*T -> 2*z`` yields (mu, log_var).  Returns
``xs[:-1][::-1]`` — deepest level excluded, order reversed to match the
decoder (encoder.py:166).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models.blocks import (
    ConvBlock,
    Dense,
    EncoderResidualBlock,
    flatten_channels_first,
)


class Encoder(nn.Module):
    z_dim: int
    hierarchical_dim: int
    num_filter_enc: Sequence[int]
    num_time: int
    small: bool = True
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        conv_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        res_cls = (nn.remat(EncoderResidualBlock) if self.remat
                   else EncoderResidualBlock)
        xs = []
        for i, f in enumerate(self.num_filter_enc):
            x = conv_cls(f, self.small, self.dtype, name=f"enc_block_{i}")(x)
            x = res_cls(f, self.small, self.dtype,
                        name=f"enc_res_{i}")(x)
            flat = flatten_channels_first(x)
            xs.append(
                Dense(self.hierarchical_dim, self.dtype,
                      name=f"xs_linear_{i}")(flat)
            )

        last = flatten_channels_first(x)
        last = Dense(2 * self.z_dim, self.dtype, name="last_x_linear")(last)
        mu = last[:, : self.z_dim]
        log_var = last[:, self.z_dim:]
        return mu, log_var, xs[:-1][::-1]
