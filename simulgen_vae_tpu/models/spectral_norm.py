"""Functional spectral normalization (power iteration) over a params pytree.

The reference wraps every Conv/Linear of the whole VAE in torch
``spectral_norm`` (``modules/common.py:15-37``, applied at
``modules/train.py:72``), which keeps a persistent ``u`` vector per weight and
runs one power iteration per forward.  Torch's stateful hook becomes, here, a
pure transformation:

    normed_params, new_state = spectral_normalize(params, state)

``state`` is a pytree of ``u`` vectors mirroring the kernel leaves; it threads
through the jitted train step alongside the optimizer state.  Gradients flow
through the normalization ``W / sigma(W)`` exactly as in torch: ``u``/``v``
are stop-gradient'd, ``sigma = v . W u`` is differentiable.

Matrix view: a kernel of shape ``(..., out)`` is reshaped to ``M = [rest, out]``.
``sigma(M) == sigma(M^T)`` so this matches torch's ``[out, rest]`` view.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

EPS = 1e-12

# Kernels at or above this element count keep exact same-shape grouping in
# compute_sigmas (padding them would add real HBM traffic); smaller kernels
# are zero-row-padded into shared buckets (see _bucket_entries).
_PAD_BUCKET_MAX_ELEMS = 4 * 1024 * 1024
# Within a bucket, a kernel's row count must be >= bucket_rows / this factor
# so per-kernel padding waste stays bounded.
_PAD_WASTE_FACTOR = 8


def _l2_normalize(v):
    return v / (jnp.linalg.norm(v) + EPS)


def _bucket_entries(entries):
    """Group (path, m, u) entries for batched power iteration.

    Same-shape grouping alone leaves the flagship VAE with 31 groups for 40
    kernels — ~80 serialized small matvecs, ~2 ms of pure dispatch tail on
    TPU (round-3 trace).  Zero-ROW padding is EXACT for power iteration:
    padded rows of M contribute nothing to ``M u``, to any norm, or to
    ``M^T v``, and the padded entries of v are exactly zero — so kernels
    that share an out-dim can share one stacked einsum after padding their
    row counts to the bucket max.  Only kernels below
    ``_PAD_BUCKET_MAX_ELEMS`` are padded (the big readout/embedding kernels
    are bandwidth-bound, not dispatch-bound, and padding them would cost
    real HBM traffic); within a bucket rows may differ by at most
    ``_PAD_WASTE_FACTOR`` so the added zero traffic stays a few MB.

    Returns a list of buckets, each a list of (path, m, u) with equal
    ``m.shape[1]``; callers pad rows to the bucket max.
    """
    big: dict = {}
    small_by_o: dict = {}
    for e in entries:
        m = e[1]
        if m.size >= _PAD_BUCKET_MAX_ELEMS:
            big.setdefault(m.shape, []).append(e)
        else:
            small_by_o.setdefault(m.shape[1], []).append(e)
    buckets = list(big.values())
    for es in small_by_o.values():
        es.sort(key=lambda e: -e[1].shape[0])
        cur, rmax = [], 0
        for e in es:
            r = e[1].shape[0]
            if cur and r * _PAD_WASTE_FACTOR < rmax:
                buckets.append(cur)
                cur, rmax = [], 0
            if not cur:
                rmax = r
            cur.append(e)
        if cur:
            buckets.append(cur)
    return buckets


def _is_sn_kernel(path: Tuple[str, ...], leaf) -> bool:
    return path[-1] == "kernel" and getattr(leaf, "ndim", 0) >= 2


def init_sn_state(params, rng: jax.Array,
                  filter_fn: Callable = None) -> dict:
    """Create the ``u`` pytree (one unit vector per normalized kernel)."""
    flat = traverse_util.flatten_dict(params)
    state = {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        if not _is_sn_kernel(path, leaf):
            continue
        if filter_fn is not None and not filter_fn(path):
            continue
        k = jax.random.fold_in(rng, i)
        out = leaf.shape[-1]
        state[path] = _l2_normalize(jax.random.normal(k, (out,), jnp.float32))
    return traverse_util.unflatten_dict(state)


def compute_sigmas(params, state, update: bool = True,
                   compute_dtype=None, with_grad_factors: bool = False):
    """Power-iterate and return ``(sigma_collection, new_state)`` WITHOUT
    materializing normalized kernels.

    Every SN'd layer is linear in its kernel, so ``layer(x; W/sigma) ==
    layer_nobias(x; W)/sigma + b``: instead of writing a full W/sigma copy
    (620 MB/step at flagship scale) the model scales each layer's *output* by
    ``1/sigma`` read from the ``sn_sigma`` variable collection this function
    builds.  Value and gradient are identical to the materializing path:

      sigma = v . (M u_new) = ||M^T v||   (u, v stop-gradient'd)
      d sigma / dM = v u_new^T            (same as torch's v^T W u form)

    so one full read of M is saved per kernel versus recomputing ``M u``.

    The returned collection mirrors the params tree with each ``kernel`` leaf
    replaced by an ``inv_sigma`` scalar at the same level — exactly where the
    owning flax module looks it up (see ``models/blocks.py``).

    Args mirror :func:`spectral_normalize`; ``update=False`` reuses the
    stored ``u`` (eval semantics: sigma = ||M u||).

    ``with_grad_factors=True`` additionally stop-gradients the whole
    computation and returns ``(sig, new_u, factors)`` where ``factors`` maps
    each kernel path to the rank-1 gradient factors ``(row, col, inv)`` with
    ``d sigma / dM = row col^T`` (f32).  Autodiff through sigma materializes
    that outer product as a FULL [rest, out] f32 tensor per kernel — 524 MB
    for the flagship's largest kernel, ~3 GB/step of pure HBM traffic across
    the kernel set (round-3 HLO trace: ``multiply_convert_fusion`` feeding
    the dW+AdamW sweeps).  The factors let the trainer add the identical
    gradient term analytically via :func:`add_sigma_rank1_grads`, which XLA
    rematerializes in-register inside the optimizer sweep.
    """
    flat_p = traverse_util.flatten_dict(params)
    flat_u = traverse_util.flatten_dict(state) if state else {}
    sig, new_u, factors = {}, {}, {}

    # Batch power iterations into as few einsums as possible: same-shape
    # kernels stack exactly; smaller kernels sharing an out-dim are
    # zero-row-padded into buckets (exact — see _bucket_entries).  The
    # flagship VAE drops from 31 serialized groups (~80 small matvecs,
    # ~2 ms dispatch tail) to ~15.
    entries_all = []
    for path, w in flat_p.items():
        u = flat_u.get(path)
        if u is None:
            continue
        m = w.reshape(-1, w.shape[-1])
        m = m.astype(compute_dtype if compute_dtype is not None
                     else jnp.float32)
        entries_all.append((path, m, u))

    for entries in _bucket_entries(entries_all):
        paths = [p for p, _, _ in entries]
        rows_n = [m_.shape[0] for _, m_, _ in entries]
        rmax = max(rows_n)
        if len(entries) == 1:
            m = entries[0][1][None]
            u = entries[0][2][None]
        else:
            m = jnp.stack([
                m_ if m_.shape[0] == rmax
                else jnp.pad(m_, ((0, rmax - m_.shape[0]), (0, 0)))
                for _, m_, _ in entries])                     # [g, Rmax, O]
            u = jnp.stack([u_ for _, _, u_ in entries])       # [g, O]
        if with_grad_factors:
            # grads handled analytically by add_sigma_rank1_grads
            m = jax.lax.stop_gradient(m)
        if update:
            mu = jnp.einsum("gro,go->gr", jax.lax.stop_gradient(m),
                            u.astype(m.dtype)).astype(jnp.float32)
            v = mu / (jnp.linalg.norm(mu, axis=1, keepdims=True) + EPS)
            v = jax.lax.stop_gradient(v)
            mtv = jnp.einsum("gro,gr->go", m,
                             v.astype(m.dtype)).astype(jnp.float32)
            sigma = jnp.linalg.norm(mtv, axis=1)              # [g]
            u_next = jax.lax.stop_gradient(
                mtv / (sigma[:, None] + EPS))
            # d sigma / dM = v (mtv/sigma)^T  (u, v stop-gradient'd;
            # sigma without EPS — the exact gradient of the norm)
            rows, cols = v, mtv / sigma[:, None]
        else:
            mu = jnp.einsum("gro,go->gr", m,
                            u.astype(m.dtype)).astype(jnp.float32)
            sigma = jnp.linalg.norm(mu, axis=1)
            u_next = u
            # sigma = ||M u||: d sigma / dM = (mu/sigma) u^T
            rows, cols = mu / sigma[:, None], u.astype(jnp.float32)
        inv = 1.0 / (sigma + EPS)
        for i, path in enumerate(paths):
            new_u[path] = u_next[i]
            sig[path[:-1] + ("inv_sigma",)] = inv[i]
            if with_grad_factors:
                # rows is [Rmax]; zero-padded entries are exactly zero —
                # slice back to the kernel's true row count.
                factors[path] = (jax.lax.stop_gradient(rows[i, :rows_n[i]]),
                                 jax.lax.stop_gradient(cols[i]),
                                 jax.lax.stop_gradient(inv[i]))

    sig_tree = traverse_util.unflatten_dict(sig)
    u_tree = traverse_util.unflatten_dict(new_u)
    if with_grad_factors:
        return sig_tree, u_tree, factors
    return sig_tree, u_tree


def add_sigma_rank1_grads(grads, g_sigmas, factors):
    """Fold sigma's parameter gradient into ``grads`` analytically.

    The model reads ``inv_sigma = 1/(sigma + EPS)`` per kernel (output
    scaling, see :func:`compute_sigmas`); with cotangent ``g_inv`` from
    ``value_and_grad(..., argnums=(params, sigmas))`` the missing term is

        dL/dW += g_inv * d inv/d sigma * d sigma/dM
               = g_inv * (-inv^2) * row col^T

    — a rank-1 outer product per kernel, added here as a broadcasted
    elementwise expression so XLA fuses it into the optimizer's existing
    HBM sweep instead of materializing full [rest, out] f32 tensors (which
    autodiff through sigma does: ~3 GB/step at flagship geometry).
    """
    flat_g = traverse_util.flatten_dict(grads)
    flat_s = traverse_util.flatten_dict(g_sigmas) if g_sigmas else {}
    for path, (row, col, inv) in factors.items():
        g_inv = flat_s.get(path[:-1] + ("inv_sigma",))
        if g_inv is None:
            continue
        leaf = flat_g[path]
        coef = g_inv * (-(inv * inv))
        r1 = (coef * row)[:, None] * col[None, :]
        flat_g[path] = leaf + r1.reshape(leaf.shape).astype(leaf.dtype)
    return traverse_util.unflatten_dict(flat_g)


def spectral_normalize(params, state, update: bool = True, n_iter: int = 1,
                       filter_fn: Callable = None, compute_dtype=None):
    """Normalize every selected kernel by its leading singular value.

    Args:
      params: model params pytree.
      state: ``u`` pytree from :func:`init_sn_state`.
      update: run power iteration and return the updated ``u`` (train mode);
        if False, reuse the stored ``u`` (eval mode, torch semantics).
      n_iter: power iterations per call (torch default 1).
      filter_fn: optional predicate on the flattened path tuple.
      compute_dtype: if set (e.g. bf16), run the power-iteration matvecs on
        the kernel cast to this dtype and emit normalized kernels in it —
        halves the SN HBM traffic on bf16 training runs (the model casts
        weights to compute dtype anyway; sigma stays accurate to ~1e-3,
        far inside power-iteration tolerance).  None = exact f32.

    Returns:
      ``(normed_params, new_state)``.
    """
    flat_p = traverse_util.flatten_dict(params)
    flat_u = traverse_util.flatten_dict(state) if state else {}
    new_p, new_u = {}, {}

    for path, w in flat_p.items():
        u = flat_u.get(path)
        if u is None:
            new_p[path] = w
            continue
        if compute_dtype is not None:
            wc = w.astype(compute_dtype)
            m = wc.reshape(-1, w.shape[-1])
            out_dtype = compute_dtype
        else:
            wc = w
            m = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
            out_dtype = w.dtype
        if update:
            for _ in range(n_iter):
                v = _l2_normalize((m @ u.astype(m.dtype)).astype(jnp.float32))
                u = _l2_normalize((m.T @ v.astype(m.dtype)).astype(jnp.float32))
        else:
            v = _l2_normalize((m @ u.astype(m.dtype)).astype(jnp.float32))
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = v.astype(jnp.float32) @ (m @ u.astype(m.dtype)).astype(jnp.float32)
        new_p[path] = (wc / sigma.astype(out_dtype)).astype(out_dtype)
        new_u[path] = u

    return (traverse_util.unflatten_dict(new_p),
            traverse_util.unflatten_dict(new_u))
