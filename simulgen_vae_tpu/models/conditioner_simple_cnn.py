"""Ultra-simple CNN latent conditioner for small datasets, NHWC layout.

Mirrors reference ``modules/latent_conditioner_model_simple_cnn.py:24-168``:
three Conv(k=7/5/3, BatchNorm, GELU, Dropout2d 0.3, MaxPool 2x2) stages with
fixed 16/32/64 channels, global average pool, a 64->128->64 MLP with heavy
dropout, and simple dual linear heads.  Xavier init throughout.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from simulgen_vae_tpu.models.blocks import gelu

xavier_uniform = nn.initializers.xavier_uniform()


class SimpleLatentConditionerImg(nn.Module):
    latent_conditioner_filter: Sequence[int]  # accepted for API parity; unused
    latent_dim_end: int
    latent_dim: int
    size2: int
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.ndim == 2:
            side = int(math.sqrt(x.shape[-1]))
            x = x.reshape(x.shape[0], side, side, 1)
        elif x.ndim == 3:
            x = x[..., None]

        for ch, k in ((16, 7), (32, 5), (64, 3)):
            x = nn.Conv(ch, (k, k), padding=k // 2, use_bias=False,
                        kernel_init=xavier_uniform, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = gelu(x)
            # Dropout2d drops whole channels per sample
            x = nn.Dropout(0.3, broadcast_dims=(1, 2),
                           deterministic=deterministic)(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 64]

        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(128, kernel_init=xavier_uniform, dtype=self.dtype)(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(64, kernel_init=xavier_uniform, dtype=self.dtype)(x)
        x = gelu(x)
        features = nn.Dropout(self.dropout_rate * 0.8,
                              deterministic=deterministic)(x)

        latent_main = nn.Dense(self.latent_dim_end, kernel_init=xavier_uniform,
                               dtype=self.dtype)(features)
        xs = nn.Dense(self.latent_dim * self.size2, kernel_init=xavier_uniform,
                      dtype=self.dtype)(features)
        xs = xs.reshape(xs.shape[0], self.size2, self.latent_dim)
        return latent_main, xs
