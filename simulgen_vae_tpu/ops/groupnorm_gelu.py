"""Fused GroupNorm + GELU Pallas TPU kernel.

The GroupNorm -> GELU pair follows nearly every conv in the VAE (SURVEY §2.3)
and, at the readout, normalizes over 95008 node-channels — the hottest
bandwidth-bound op after the embedding matmuls.  This kernel computes the
group statistics, normalization, affine, and exact GELU in one VMEM pass per
(sample, group) grid cell: a single HBM read + write of the feature map.

Grid: ``(B, G)``; each program loads the ``[T, C/G]`` slice of one sample's
group (fits VMEM for every geometry this model family uses: the largest is
200 x 11876 f32 = 9.5 MB), reduces mean/var, and writes the activated output.
Group slices need not be 128-lane aligned — Mosaic handles padding.

Gradient: ``jax.custom_vjp`` whose backward differentiates the identical-math
XLA reference implementation (rematerialized — same activations-recompute
trade the trainer makes anyway).  Forward parity with torch GroupNorm+GELU is
covered by tests; ``interpret=True`` makes the same kernel run on CPU.

Enable/disable with env ``SIMULGEN_PALLAS`` (default: on for TPU backends).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_FORCE = os.environ.get("SIMULGEN_PALLAS")


def pallas_enabled() -> bool:
    if _FORCE is not None:
        return _FORCE not in ("0", "false", "off")
    return jax.default_backend() == "tpu"


def _activate(x, act: str):
    if act == "gelu":
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


def _kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float, act: str):
    x = x_ref[0].astype(jnp.float32)          # [T, Cg]
    mean = jnp.mean(x)
    var = jnp.mean((x - mean) ** 2)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    out = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out_ref[0] = _activate(out, act).astype(out_ref.dtype)


def _pallas_forward(x, scale, bias, num_groups: int, eps: float,
                    act: str = "gelu"):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    g = num_groups
    cg = c // g
    interpret = jax.default_backend() != "tpu"

    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, t, cg), lambda i, j: (i, 0, j)),
            pl.BlockSpec((cg,), lambda i, j: (j,)),
            pl.BlockSpec((cg,), lambda i, j: (j,)),
        ],
        out_specs=pl.BlockSpec((1, t, cg), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(x, scale, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_gelu(x, scale, bias, num_groups: int, eps: float = 1e-5,
                          act: str = "gelu"):
    return _pallas_forward(x, scale, bias, num_groups, eps, act)


def _fwd(x, scale, bias, num_groups, eps, act):
    out = _pallas_forward(x, scale, bias, num_groups, eps, act)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, act, residuals, grad):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda a, s, b: group_norm_gelu_reference(a, s, b, num_groups, eps,
                                                  act),
        x, scale, bias,
    )
    return vjp(grad)


fused_group_norm_gelu.defvjp(_fwd, _bwd)


def group_norm_gelu(x, scale, bias, num_groups: int, eps: float = 1e-5,
                    act: str = "gelu",
                    use_pallas: bool | None = None) -> jax.Array:
    """Dispatch: Pallas fused kernel on TPU, XLA reference elsewhere."""
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if use_pallas:
        return fused_group_norm_gelu(x, scale, bias, num_groups, eps, act)
    return group_norm_gelu_reference(x, scale, bias, num_groups, eps, act)
