"""Vision-Transformer latent conditioner for image inputs.

The reference *advertises* a ViT conditioner (README.md:15, SimulGen-VAE.py:10
and the ``"image_vit"`` error strings at SimulGen-VAE.py:374/425) but ships no
model file (SURVEY §2.3).  This is the missing member of the family, built
TPU-first: patch embedding is one MXU matmul, attention uses
``jax.nn.dot_product_attention``, all shapes static.

Architecture: patchify -> linear embed + learned positions -> pre-LN
transformer encoder (MHSA + GELU MLP) -> mean pool -> dual heads matching the
other conditioners' output contract ``(latent_main [B, z_end],
xs [B, size2, latent_dim])``.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models.blocks import gelu


class _TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout_rate,
        )(h, h, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(h)
        h = gelu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class LatentConditionerViT(nn.Module):
    latent_dim_end: int
    latent_dim: int
    size2: int
    patch_size: int = 16
    embed_dim: int = 256
    depth: int = 6
    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.ndim == 2:
            side = int(math.sqrt(x.shape[-1]))
            x = x.reshape(x.shape[0], side, side, 1)
        elif x.ndim == 3:
            x = x[..., None]

        b, hgt, wid, c = x.shape
        p = self.patch_size
        gh, gw = hgt // p, wid // p
        # Patchify: [B, gh, p, gw, p, C] -> [B, gh*gw, p*p*C]
        patches = x[:, : gh * p, : gw * p, :].reshape(b, gh, p, gw, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, -1)

        tokens = nn.Dense(self.embed_dim, dtype=self.dtype,
                          name="patch_embed")(patches)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, gh * gw, self.embed_dim),
        )
        tokens = tokens + pos
        tokens = nn.Dropout(self.dropout_rate,
                            deterministic=deterministic)(tokens)

        for i in range(self.depth):
            tokens = _TransformerBlock(
                self.embed_dim, self.num_heads,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, deterministic)

        tokens = nn.LayerNorm(dtype=self.dtype)(tokens)
        feats = jnp.mean(tokens, axis=1)

        latent_main = nn.Dense(self.latent_dim_end, dtype=self.dtype,
                               name="latent_main_head")(feats)
        xs = nn.Dense(self.latent_dim * self.size2, dtype=self.dtype,
                      name="xs_head")(feats)
        xs = xs.reshape(b, self.size2, self.latent_dim)
        return latent_main, xs
