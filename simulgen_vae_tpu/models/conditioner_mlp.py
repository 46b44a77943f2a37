"""MLP latent conditioner for parametric/CSV data.

Mirrors reference ``modules/latent_conditioner_model_parametric.py:25-214``:
LayerNorm input -> backbone over ``filters`` (first layer plain
Linear+LN+GELU+Dropout, rest pre-activation residual MLP blocks with the
progressive dropout schedule x[.5,.7,1.,1.2]) -> feature projection
(LN + Dropout 0.8x) -> dual heads (Linear-LN-GELU-Dropout x2 -> Linear ->
Tanh) for the main latent ``[B, latent_dim_end]`` and hierarchical latents
``[B, size2, latent_dim]``.  Bottleneck sizing: ``hidden = max(2*z_end,
f_last // clamp(input/64, 2, 8))`` (parametric.py:149-150).

Init: the model file self-initializes Xavier (parametric.py:184-196), but
the reference trainer immediately re-applies He/Kaiming-uniform to every
layer (``safe_initialize_weights_He``, latent_conditioner.py:225) — so the
EFFECTIVE init is He-uniform, which is what we use directly.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models.blocks import gelu

# Effective reference init is He-uniform (see module docstring).
he_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class _MLPResidualBlock(nn.Module):
    """Residual MLP block (parametric.py:25-67)."""

    features: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        identity = x
        h = nn.Dense(self.features, kernel_init=he_uniform,
                     dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = gelu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.features, kernel_init=he_uniform,
                     dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)

        if x.shape[-1] != self.features:
            identity = nn.Dense(self.features, kernel_init=he_uniform,
                                dtype=self.dtype)(x)
            identity = nn.LayerNorm(dtype=self.dtype)(identity)

        return gelu(h + identity)


class _Head(nn.Module):
    """Dual-output head (parametric.py:158-182)."""

    hidden: int
    out_dim: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.hidden, kernel_init=he_uniform,
                     dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = gelu(h)
        h = nn.Dropout(self.dropout_rate * 0.6, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden // 2, kernel_init=he_uniform,
                     dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = gelu(h)
        h = nn.Dropout(self.dropout_rate * 0.4, deterministic=deterministic)(h)
        h = nn.Dense(self.out_dim, kernel_init=he_uniform,
                     dtype=self.dtype)(h)
        return jnp.tanh(h)


class LatentConditioner(nn.Module):
    """MLP latent conditioner (parametric.py:70-214)."""

    latent_conditioner_filter: Sequence[int]
    latent_dim_end: int          # main latent dim (32)
    input_shape: int             # number of input features
    latent_dim: int              # hierarchical latent dim (8)
    size2: int                   # number of hierarchical latents
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dropout_schedule = [0.5, 0.7, 1.0, 1.2]

        x = nn.LayerNorm(dtype=self.dtype, name="input_norm")(x)

        for i, next_dim in enumerate(self.latent_conditioner_filter):
            rate = self.dropout_rate * dropout_schedule[
                min(i, len(dropout_schedule) - 1)
            ]
            if i == 0:
                x = nn.Dense(next_dim, kernel_init=he_uniform,
                             dtype=self.dtype)(x)
                x = nn.LayerNorm(dtype=self.dtype)(x)
                x = gelu(x)
                x = nn.Dropout(rate, deterministic=deterministic)(x)
            else:
                x = _MLPResidualBlock(next_dim, rate, self.dtype)(
                    x, deterministic
                )

        final = self.latent_conditioner_filter[-1]
        complexity_ratio = min(8, max(2, self.input_shape // 64))
        hidden = max(self.latent_dim_end * 2, final // complexity_ratio)

        features = nn.LayerNorm(dtype=self.dtype, name="feature_norm")(x)
        features = nn.Dropout(self.dropout_rate * 0.8,
                              deterministic=deterministic)(features)

        latent_out = _Head(hidden, self.latent_dim_end, self.dropout_rate,
                           self.dtype, name="latent_out")(features, deterministic)
        xs_out = _Head(hidden, self.latent_dim * self.size2, self.dropout_rate,
                       self.dtype, name="xs_out")(features, deterministic)
        xs_out = xs_out.reshape(xs_out.shape[0], self.size2, self.latent_dim)

        return latent_out, xs_out
