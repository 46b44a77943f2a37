"""CNN latent conditioner for image inputs, NHWC layout.

Mirrors reference ``modules/latent_conditioner_model_cnn.py:30-363``: ResNet
bottleneck backbone with GroupNorm, Squeeze-and-Excitation attention on
blocks 2-4, spectral normalization on the marked layers, adaptive global
pooling, and dual prediction heads with BatchNorm + skip projections.

Two deliberate departures, both documented:

* ``SpatialAttention`` (cnn.py:55-71) is defined in the reference but never
  wired into the forward pass (SURVEY §2.3); here it actually runs after the
  SE module on the same blocks when ``use_attention`` is set — honoring the
  ``use_spatial_attention`` config key that the reference exposes but ignores.
* Layers the reference wraps in torch ``spectral_norm`` are named ``sn_*``;
  the functional power iteration in ``models/spectral_norm.py`` is applied to
  exactly those paths via :func:`sn_filter`.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_normal = nn.initializers.xavier_normal()


def sn_filter(path) -> bool:
    """True for params belonging to spectral-normalized layers (named sn_*)."""
    return any(str(p).startswith("sn_") for p in path)


def _cnn_groups(channels: int) -> int:
    """Largest of [32,16,8,4,2,1] dividing channels (cnn.py:111-118)."""
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


class SqueezeExcitation(nn.Module):
    """Channel attention (cnn.py:30-52)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(max(self.channels // self.reduction, 1),
                     dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SpatialAttention(nn.Module):
    """Spatial attention (cnn.py:55-71) — wired in, see module docstring."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        max_out = jnp.max(x, axis=-1, keepdims=True)
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        attn = jnp.concatenate([avg_out, max_out], axis=-1)
        attn = nn.Conv(1, (self.kernel_size, self.kernel_size),
                       padding="SAME", use_bias=False, dtype=self.dtype)(attn)
        return x * jax.nn.sigmoid(attn)


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block (cnn.py:74-135): mid = out//2, stride on the
    3x3 conv, GroupNorm, optional SE (+ spatial) attention, ReLU join."""

    in_channels: int
    out_channels: int
    stride: int = 1
    use_attention: bool = True
    use_spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=kaiming_normal,
                    dtype=self.dtype, name="sn_conv1")(x)
        h = nn.GroupNorm(num_groups=_cnn_groups(mid), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3),
                    strides=(self.stride, self.stride), padding=1,
                    use_bias=False, kernel_init=kaiming_normal,
                    dtype=self.dtype, name="sn_conv2")(h)
        h = nn.GroupNorm(num_groups=_cnn_groups(self.out_channels),
                         epsilon=1e-5, dtype=self.dtype)(h)

        if self.use_attention:
            h = SqueezeExcitation(self.out_channels, dtype=self.dtype)(h)
            if self.use_spatial:
                h = SpatialAttention(dtype=self.dtype)(h)

        skip = x
        if self.stride != 1 or self.in_channels != self.out_channels:
            skip = nn.Conv(self.out_channels, (1, 1),
                           strides=(self.stride, self.stride), use_bias=False,
                           kernel_init=kaiming_normal, dtype=self.dtype,
                           name="sn_skip")(x)
            skip = nn.GroupNorm(num_groups=_cnn_groups(self.out_channels),
                                epsilon=1e-5, dtype=self.dtype)(skip)

        return nn.relu(h + skip)


class _BNHead(nn.Module):
    """Prediction-head stage: SN Linear -> BatchNorm -> ReLU -> Dropout
    (cnn.py:231-243)."""

    features: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.features, kernel_init=kaiming_normal,
                     dtype=self.dtype, name="sn_linear")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class LatentConditionerImg(nn.Module):
    """CNN image conditioner (cnn.py:138-363).

    Input: flattened grayscale images ``[B, H*W]`` (reshaped to square) or
    ``[B, H, W, C]``.  Output: ``(latent_main [B, latent_dim_end],
    xs [B, size2, latent_dim])``.
    """

    latent_conditioner_filter: Sequence[int]
    latent_dim_end: int
    latent_dim: int
    size2: int
    dropout_rate: float = 0.3
    use_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.ndim == 2:
            side = int(math.sqrt(x.shape[-1]))
            x = x.reshape(x.shape[0], side, side, 1)
        elif x.ndim == 3:
            x = x[..., None]

        # [-1, 1] -> [0, 1] rescale when input appears signed (cnn.py:321-322),
        # done branch-free so it traces.
        is_signed = jnp.min(x) < -0.1
        x = jnp.where(is_signed, (x + 1.0) / 2.0, x)

        f = self.latent_conditioner_filter
        h = nn.Conv(f[0], (7, 7), padding=3, use_bias=False,
                    kernel_init=kaiming_normal, dtype=self.dtype,
                    name="sn_initial_conv")(x)
        h = nn.GroupNorm(num_groups=_cnn_groups(f[0]), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_ch = f[0]
        for i, out_ch in enumerate(f[1:]):
            stride = 2 if i in (1, 3) else 1           # cnn.py:195
            use_se = self.use_attention and 2 <= i <= 4  # cnn.py:198
            h = ResNetBlock(in_ch, out_ch, stride, use_se,
                            use_spatial=use_se, dtype=self.dtype,
                            name=f"layer_{i}")(h)
            in_ch = out_ch

        h = jnp.mean(h, axis=(1, 2))  # adaptive avg pool -> [B, C]

        final = f[-1]
        hidden = final * 2
        h = nn.Dropout(self.dropout_rate * 0.3, deterministic=deterministic)(h)
        h = nn.Dense(hidden, kernel_init=kaiming_normal, dtype=self.dtype,
                     name="sn_fp1")(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate * 0.4, deterministic=deterministic)(h)
        h = nn.Dense(hidden, kernel_init=kaiming_normal, dtype=self.dtype,
                     name="sn_fp2")(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        features = nn.Dropout(self.dropout_rate * 0.4,
                              deterministic=deterministic)(h)

        def head(prefix, out_dim):
            a = _BNHead(hidden // 2, self.dropout_rate * 0.3, self.dtype,
                        name=f"{prefix}_layer1")(features, deterministic)
            a = _BNHead(hidden // 4, 0.2, self.dtype,
                        name=f"{prefix}_layer2")(a, deterministic)
            skip = nn.Dense(hidden // 4, kernel_init=kaiming_normal,
                            dtype=self.dtype,
                            name=f"{prefix}_skip_proj")(features)
            out = nn.Dense(out_dim, kernel_init=xavier_normal,
                           dtype=self.dtype, name=f"{prefix}_output")(a + skip)
            return out

        latent_main = head("latent_main", self.latent_dim_end)
        xs = head("xs", self.latent_dim * self.size2)
        xs = xs.reshape(xs.shape[0], self.size2, self.latent_dim)
        return latent_main, xs
