"""Shared building blocks for the hierarchical VAE, in NWC layout.

All tensors are ``[batch, time, channels]`` so the channel axis maps onto the
TPU's 128-lane dimension and every k=1 conv lowers to a plain MXU matmul.

Math mirrors the reference exactly (channels-first torch modules):

* ``ConvBlock``            <- ``modules/encoder.py:14-57``
* ``EncoderResidualBlock`` <- ``modules/common.py:104-125``
* ``DecoderResidualBlock`` <- ``modules/common.py:127-162`` (5x bottleneck)
* ``ResidualBlock``        <- ``modules/common.py:78-102``
* ``DecoderBlock``         <- ``modules/decoder.py:17-82`` (ConvTranspose1d
  with stride 1 / pad 1 is function-space identical to a 3-tap SAME conv with
  flipped taps, so we use a regular conv — better XLA lowering, same model
  class)

Every GroupNorm+activation pair goes through :class:`NormAct`, which owns the
affine parameters and dispatches to the fused Pallas GroupNorm+activation
kernel on TPU (one VMEM pass) or the numerically identical XLA reference
elsewhere (``ops/groupnorm_gelu.py``).  Statistics are computed in f32
regardless of compute dtype.

Shared conventions: GroupNorm(min(8, max(1, C//4)), eps=1e-5), exact (erf)
GELU, residual branches scaled by 0.1, He/Kaiming-uniform init
(``modules/common.py:39-59``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simulgen_vae_tpu.ops.groupnorm_gelu import group_norm_gelu
from simulgen_vae_tpu.ops.quant import int8_conv1d_same, int8_dot, quant_vars

# He (Kaiming) uniform, matching torch kaiming_uniform_ with relu gain:
# bound = sqrt(6 / fan_in).
he_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def group_count(channels: int) -> int:
    """Reference group formula min(8, max(1, C//4)) (encoder.py:35 et al.),
    reduced to the nearest divisor of C (torch asserts divisibility; the
    reference only ever uses divisible configs)."""
    g = min(8, max(1, channels // 4))
    while channels % g != 0:
        g -= 1
    return g


def gelu(x):
    """Exact (erf-based) GELU — torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


class NormAct(nn.Module):
    """GroupNorm (+ fused activation) over [B, T, C].

    Per-sample stats over (T x group-channels), identical to torch GroupNorm
    on [B, C, T]; eps matches torch (1e-5).  ``act`` in {'gelu','tanh','none'}.
    """

    channels: int
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return group_norm_gelu(x, scale, bias, group_count(self.channels),
                               act=self.act)


def _sn_inv_sigma(module: nn.Module):
    """Per-layer inverse spectral norm, if the caller provided one.

    ``models/spectral_norm.compute_sigmas`` builds an ``sn_sigma`` variable
    collection mirroring the params tree (``.../kernel`` -> ``.../inv_sigma``)
    so each linear layer can scale its OUTPUT by ``1/sigma`` instead of the
    trainer materializing a full ``W/sigma`` copy (620 MB/step at flagship
    scale).  Function-identical to torch spectral_norm: the layer is linear
    in W, so ``conv(x, W/s) + b == conv(x, W)/s + b``.
    """
    if module.has_variable("sn_sigma", "inv_sigma"):
        return module.get_variable("sn_sigma", "inv_sigma")
    return None


def _conv_mode() -> str:
    """How k>1 time-axis convs lower: 'conv' (lax.conv_general_dilated) or
    'matmul' (sum of k time-shifted MXU matmuls).  Measured on v5e at
    flagship scale (docs/PERF.md round 2): matmul mode wins the forward
    (29.4 vs 33.1 ms) but loses the full bench step (159.9 vs 166.5
    samples/s) — XLA's conv-backward fusions beat the unrolled matmul
    backward — so 'conv' is the default and matmul stays an opt-in
    experiment.  Override with SIMULGEN_CONV=conv|matmul."""
    import os

    return ("matmul" if os.environ.get("SIMULGEN_CONV") == "matmul"
            else "conv")


def conv1d_same(x, kernel):
    """stride-1 SAME 1-D conv over [B, T, C] with HIO kernel [k, C, F].

    k == 1 is a plain matmul; k > 1 dispatches per :func:`_conv_mode`.
    Matmul mode computes ``sum_d shift(x, d) @ W[d]`` — slices of the padded
    input are views, each term is an MXU-shaped dense matmul, f32 accumulate,
    one cast at the end (bit-comparable to the conv lowering, which also
    accumulates f32)."""
    k = kernel.shape[0]
    if k == 1:
        return jnp.einsum("btc,cf->btf", x, kernel[0],
                          preferred_element_type=jnp.float32).astype(x.dtype)
    if _conv_mode() == "conv":
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
    t = x.shape[1]
    pad = k // 2  # odd k only (reference uses 1/3/5)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = None
    for d in range(k):
        xd = jax.lax.dynamic_slice_in_dim(xp, d, t, axis=1)
        yd = jnp.einsum("btc,cf->btf", xd, kernel[d],
                        preferred_element_type=jnp.float32)
        y = yd if y is None else y + yd
    return y.astype(x.dtype)


class _ConvCore(nn.Module):
    """Explicit-param 1-D conv, path/init-compatible with ``flax nn.Conv``
    (same ``kernel``/``bias`` names, shapes, and init streams) but SN-aware:
    the kernel contribution is scaled by ``inv_sigma`` BEFORE the bias add."""

    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", he_uniform,
            (self.kernel_size, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        inv = _sn_inv_sigma(self)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        kq, ks = quant_vars(self)
        if kq is not None:
            # Int8 serving path (ops/quant.py): weights pre-quantized
            # per-output-channel, activations quantized per-tensor inline,
            # int32 accumulate on the MXU, f32 rescale.  Opt-in via a
            # "quant" collection from build_quant_collection.
            y = int8_conv1d_same(x, kq, ks).astype(x.dtype)
        else:
            y = conv1d_same(x, kernel)
        if inv is not None:
            y = y * inv.astype(y.dtype)
        return y + bias


class Conv1d(nn.Module):
    """k-tap 1-D conv over the time axis of [B, T, C] data."""

    features: int
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # name="Conv_0" keeps the param paths of the original nn.Conv wrapper
        return _ConvCore(self.features, self.kernel_size, self.dtype,
                         name="Conv_0")(x)


class ConvBlock(nn.Module):
    """Encoder conv block (encoder.py:14-57).

    small: Conv(k=1) -> GN -> GELU
    large: ... -> Conv(k=3) -> GN -> GELU
    """

    features: int
    small: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.features, 1, self.dtype)(x)
        x = NormAct(self.features, "gelu", self.dtype)(x)
        if not self.small:
            x = Conv1d(self.features, 3, self.dtype)(x)
            x = NormAct(self.features, "gelu", self.dtype)(x)
        return x


class EncoderResidualBlock(nn.Module):
    """x + 0.1 * seq(x); seq = (Conv k=3 -> GN -> GELU) x (1 small / 2 large)
    (common.py:104-125)."""

    features: int
    small: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        reps = 1 if self.small else 2
        for _ in range(reps):
            h = Conv1d(self.features, 3, self.dtype)(h)
            h = NormAct(self.features, "gelu", self.dtype)(h)
        return x + 0.1 * h


class ResidualBlock(nn.Module):
    """Generic residual block used in the decoder prior/posterior heads
    (common.py:78-102): same shape as EncoderResidualBlock."""

    features: int
    small: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        reps = 1 if self.small else 2
        for _ in range(reps):
            h = Conv1d(self.features, 3, self.dtype)(h)
            h = NormAct(self.features, "gelu", self.dtype)(h)
        return x + 0.1 * h


class DecoderResidualBlock(nn.Module):
    """x + 0.1 * bottleneck(x) with 5x channel expansion (common.py:127-162).

    small: k=1 expand -> k=5 -> k=1 contract (each Conv -> GN -> GELU)
    large: k=1 keep  -> k=5 expand -> k=5 -> k=1 contract
    """

    features: int
    small: bool = True
    dtype: Any = jnp.float32
    EXPANSION: int = 5

    @nn.compact
    def __call__(self, x):
        f, m = self.features, self.features * self.EXPANSION

        def cgg(h, feat, k):
            h = Conv1d(feat, k, self.dtype)(h)
            return NormAct(feat, "gelu", self.dtype)(h)

        h = x
        if self.small:
            h = cgg(h, m, 1)
            h = cgg(h, m, 5)
            h = cgg(h, f, 1)
        else:
            h = cgg(h, f, 1)
            h = cgg(h, m, 5)
            h = cgg(h, m, 5)
            h = cgg(h, f, 1)
        return x + 0.1 * h


class DecoderBlock(nn.Module):
    """Decoder upsample block (decoder.py:17-82): Conv(k=3, SAME) -> GELU.

    The reference's ConvTranspose1d uses stride 1 so there is no true
    upsampling (SURVEY §2.3); with stride 1 a transposed conv is a regular
    conv with flipped taps, so this is the same function class lowered to the
    faster primitive.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.features, 3, self.dtype)(x)
        return gelu(x)


class _DenseCore(nn.Module):
    """Explicit-param dense layer, path/init-compatible with ``flax
    nn.Dense`` and SN-aware (see :class:`_ConvCore`)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", he_uniform,
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        inv = _sn_inv_sigma(self)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        kq, ks = quant_vars(self)
        if kq is not None:
            y = int8_dot(x, kq, ks).astype(x.dtype)
        else:
            y = jnp.dot(x, kernel)
        if inv is not None:
            y = y * inv.astype(y.dtype)
        return y + bias


class Dense(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # name="Dense_0" keeps the param paths of the original nn.Dense use
        return _DenseCore(self.features, self.dtype, name="Dense_0")(x)


class FusedPointwiseNormTanh(nn.Module):
    """Fused readout: k=1 conv -> GroupNorm -> Tanh in ONE full-map pass.

    The readout (decoder.py:117-121) maps ``[B,T,F] -> [B,T,nodes]`` with a
    pointwise conv then GroupNorm+Tanh over 95008 channels — naively three
    bandwidth-bound passes over a ~2.4 GB map (measured 5.5 + 7.2 ms fwd on
    v5e).  Because the conv is pointwise, the GroupNorm statistics of
    ``y = x W + b`` are computable from ``x`` and ``W`` alone:

        sum_g  y  = w_g . sum_t x_t + T b_g           (w_g = per-group col sum)
        sum_g  y^2 = sum_t x_t^T M_g x_t + 2 bw_g . sum_t x_t + T ||b_g||^2
                     (M_g = per-group Gram of W columns, [F,F])

    so the normalization becomes a per-(sample, group) affine folded into the
    matmul epilogue: one pass writes the final tanh'd output.  Statistics in
    f32; same math as GroupNorm up to float association (tested vs torch).

    Measured on v5e (flagship): the analytic path's backward (gradients
    through the Gram/weight aggregates) costs more than the forward saves —
    144.9 vs 155.8 samples/s — so ``analytic=False`` (direct matmul + GN)
    is the default; both paths share the same parameter layout.
    """

    num_node: int
    dtype: Any = jnp.float32
    eps: float = 1e-5
    analytic: bool = False

    @nn.compact
    def __call__(self, h, x_target=None, lossfun: str = "MSE"):
        # h: [B, T, F].  With ``x_target`` given, dispatch to the fully
        # fused Pallas train path (matmul + GN + tanh + loss epilogue, ONE
        # write + ONE read of the [B,T,nodes] map, x_hat never
        # materialized — ops/readout_chain.py) and return
        # ``(recon_loss, recon_mse)`` means instead of x_hat.
        f = h.shape[-1]
        c = self.num_node
        t = h.shape[1]
        g = group_count(c)
        cg = c // g

        kernel = self.param("kernel", he_uniform, (f, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        norm_bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        inv = _sn_inv_sigma(self)

        if x_target is not None:
            from simulgen_vae_tpu.ops.readout_chain import readout_chain_loss

            inv_val = (inv if inv is not None
                       else jnp.ones((), jnp.float32))
            return readout_chain_loss(
                h, kernel, bias, scale, norm_bias, x_target, inv_val,
                g, self.eps, lossfun,
            )

        if not self.analytic:
            from simulgen_vae_tpu.ops.groupnorm_gelu import group_norm_gelu

            if inv is not None and f <= c:
                # Scale the INPUT by 1/sigma — same math (the layer is
                # linear), but sigma's backward ops ride the [B,T,F] side,
                # which is ~93x smaller than [B,T,nodes] at flagship
                # geometry.  An output-side scale makes XLA materialize a
                # full f32 dy*inv map in the backward once inv is a
                # grad-tracked input (round-3 HLO: 1.2 GB/step).
                h = (h.astype(jnp.float32) * inv).astype(h.dtype)
                inv = None
            kq, ks = quant_vars(self)
            if kq is not None:
                y = int8_dot(h, kq, ks)
            else:
                y = jnp.einsum("btf,fc->btc", h, kernel.astype(h.dtype),
                               preferred_element_type=jnp.float32)
            if inv is not None:
                y = y * inv
            y = (y + bias.astype(jnp.float32)).astype(h.dtype)
            return group_norm_gelu(y, scale, bias=norm_bias, num_groups=g,
                                   eps=self.eps, act="tanh").astype(self.dtype)

        sn_inv = inv  # keep the SN scalar distinct from the inverse-std below
        h32 = h.astype(jnp.float32)
        k32 = kernel.astype(jnp.float32).reshape(f, g, cg)
        if sn_inv is not None:
            k32 = k32 * sn_inv  # SN folds linearly into the analytic stats
        b32 = bias.astype(jnp.float32).reshape(g, cg)

        w_sum = jnp.sum(k32, axis=2)                    # [F, G]
        b_sum = jnp.sum(b32, axis=1)                    # [G]
        bsq_sum = jnp.sum(b32 ** 2, axis=1)             # [G]
        gram = jnp.einsum("fgc,egc->gfe", k32, k32)     # [G, F, F]
        bw = jnp.einsum("fgc,gc->gf", k32, b32)         # [G, F]

        hsum = jnp.sum(h32, axis=1)                     # [B, F]
        sum_y = hsum @ w_sum + t * b_sum                # [B, G]
        hmh = jnp.einsum("btf,gfe,bte->bg", h32, gram, h32)
        sum_y2 = hmh + 2.0 * (hsum @ bw.T) + t * bsq_sum

        denom = float(t * cg)
        mean = sum_y / denom                            # [B, G]
        var = sum_y2 / denom - mean ** 2
        inv_std = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.eps)

        scale32 = scale.astype(jnp.float32)
        inv_c = jnp.repeat(inv_std, cg, axis=1)         # [B, C]
        mean_c = jnp.repeat(mean, cg, axis=1)
        eff_scale = inv_c * scale32[None, :]
        eff_shift = (norm_bias.astype(jnp.float32)[None, :]
                     - mean_c * eff_scale)

        y = jnp.einsum("btf,fc->btc", h, kernel.astype(h.dtype),
                       preferred_element_type=jnp.float32)
        if sn_inv is not None:
            y = y * sn_inv
        y = y + bias.astype(jnp.float32)
        out = jnp.tanh(y * eff_scale[:, None, :] + eff_shift[:, None, :])
        return out.astype(self.dtype)


def flatten_channels_first(x: jax.Array) -> jax.Array:
    """Flatten [B, T, C] -> [B, C*T] in torch (channel-major) order.

    The reference flattens [B, C, T] feature maps before its per-level linear
    heads (encoder.py:156,161); keeping the same element order makes weight
    layouts directly comparable with the torch oracle.
    """
    return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)
