"""Int8 weight quantization for the serving (decode) path.

TPU v5e's MXU runs int8 matmuls at 2x the bf16 rate (394 vs 197 TOPS), and
the generation pipeline (SURVEY §3.5: conditioner -> decoder, the reference's
buried path at ``reconstruction_evaluator.py:160-178``) is forward-only, so
its matmuls can drop to int8 without touching training numerics.  This
module provides the three pieces:

* :func:`quantize_kernel` — symmetric per-output-channel weight quantization
  (host-side, once at pipeline build).
* :func:`int8_dot` / :func:`int8_conv1d_same` — dynamic per-tensor activation
  quantization fused around an int8 MXU ``dot_general`` with int32
  accumulation; output rescaled in f32.
* :func:`build_quant_collection` — mirrors a flax params tree into a
  ``"quant"`` variable collection (``kernel`` -> ``kernel_q``/``kernel_s``)
  that the linear cores in ``models/blocks.py`` pick up when present.

Only matmul/conv kernels are quantized; GroupNorm statistics, biases,
residual adds, and activations stay in f32/bf16.  The path is opt-in
(``make_generate_fn(..., quantize="int8")``); quality is measured, not
assumed — see docs/PERF.md "Int8 serving decode".
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(kernel: np.ndarray):
    """Symmetric per-output-channel int8 quantization of a weight tensor.

    The OUTPUT feature axis is the last one for every kernel in this model
    (conv ``[k, C, F]``, dense/readout ``[C, F]``), so scales are computed
    over all other axes.  Returns ``(kq int8 [same shape], scale f32 [F])``
    with ``kernel ~= kq * scale``.
    """
    k32 = np.asarray(kernel, np.float32)
    red = tuple(range(k32.ndim - 1))
    amax = np.max(np.abs(k32), axis=red)
    scale = np.where(amax > 0, amax, 1.0).astype(np.float32) / 127.0
    kq = np.clip(np.round(k32 / scale), -127, 127).astype(np.int8)
    return kq, scale


def _quantize_act(x: jax.Array):
    """Dynamic PER-ROW symmetric activation quantization -> (xq, sx).

    The contraction axis is the last one, so a per-row (leading-axes) scale
    factors exactly out of the int32 dot: ``x ~= xq * sx`` with ``sx``
    shaped ``x.shape[:-1] + (1,)``.  Per-row beats per-tensor materially on
    converged models — a single outlier row no longer inflates every row's
    quantization step (measured: flagship-filter decode MSE ratio 1.10
    per-tensor -> see docs/PERF.md for the per-row number).
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-30) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int8_dot(x: jax.Array, kq: jax.Array, scale: jax.Array) -> jax.Array:
    """``x @ dequant(kq)`` with the contraction on the int8 MXU.

    ``x`` is float ``[..., C]``; ``kq`` int8 ``[C, F]``; ``scale`` f32 ``[F]``.
    Returns f32 ``[..., F]``.
    """
    xq, sx = _quantize_act(x)
    y = jax.lax.dot_general(
        xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * scale.astype(jnp.float32))


def int8_conv1d_same(x: jax.Array, kq: jax.Array,
                     scale: jax.Array) -> jax.Array:
    """stride-1 SAME 1-D conv over ``[B, T, C]`` with int8 HIO kernel
    ``[k, C, F]``: the input is quantized ONCE (per-row scales), each tap is
    an int8 matmul on a shifted view.  Because neighbouring rows carry
    different scales, each tap's int32 partial is rescaled to f32 before the
    cross-tap add (the matmuls stay int8; XLA fuses the rescale+add into the
    epilogue)."""
    k = kq.shape[0]
    if k == 1:
        return int8_dot(x, kq[0], scale)
    t = x.shape[1]
    pad = k // 2  # odd k only (the model uses 1/3/5)
    xq, sx = _quantize_act(jnp.pad(x, ((0, 0), (pad, pad), (0, 0))))
    acc = None
    for d in range(k):
        xd = jax.lax.dynamic_slice_in_dim(xq, d, t, axis=1)
        sd = jax.lax.dynamic_slice_in_dim(sx, d, t, axis=1)
        yd = jax.lax.dot_general(
            xd, kq[d], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sd
        acc = yd if acc is None else acc + yd
    return acc * scale.astype(jnp.float32)


def build_quant_collection(params: Dict[str, Any]) -> Dict[str, Any]:
    """Mirror a flax params (sub)tree into a ``"quant"`` collection.

    Every module scope holding a ``kernel`` ndarray gets ``kernel_q`` (int8)
    and ``kernel_s`` (f32 per-output-channel) at the same path; everything
    else (biases, norm affines) is skipped.  Pass the result as
    ``apply({"params": ..., "quant": <this>}, ...)`` — the linear cores in
    ``models/blocks.py`` switch to the int8 path wherever the mirror has an
    entry, and fall back to the float path elsewhere.
    """
    out: Dict[str, Any] = {}
    for name, value in params.items():
        if isinstance(value, dict):
            sub = build_quant_collection(value)
            if sub:
                out[name] = sub
        elif name == "kernel" and hasattr(value, "shape"):
            kq, s = quantize_kernel(np.asarray(value))
            out["kernel_q"] = jnp.asarray(kq)
            out["kernel_s"] = jnp.asarray(s)
    return out


def quant_vars(module) -> tuple:
    """Read ``(kernel_q, kernel_s)`` from a module's ``quant`` collection,
    or ``(None, None)`` when the caller didn't provide one (float path)."""
    if module.has_variable("quant", "kernel_q"):
        return (module.get_variable("quant", "kernel_q"),
                module.get_variable("quant", "kernel_s"))
    return None, None
