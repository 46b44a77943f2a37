"""Model / train-state summaries printed at build time.

The reference prints a ``torchinfo.summary`` table when each model is built
(reference ``modules/train.py:67``, ``modules/latent_conditioner.py:241``).
The TPU-native equivalent summarizes the *parameter pytree* instead of
tracing layer-by-layer output shapes — and, because HBM is the scarce
resource on a TPU chip, it also accounts the full train state (params +
optimizer moments + spectral-norm vectors), which torchinfo never shows.

Everything here works on concrete arrays **or** ``jax.ShapeDtypeStruct``
trees, so the CLI can print the table from ``jax.eval_shape`` without
allocating a single device byte.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax


def _leaf_stats(tree):
    """[(path_str, n_params, n_bytes)] for every array-like leaf."""
    out = []
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        if not hasattr(leaf, "shape") or not hasattr(leaf, "dtype"):
            continue
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
            elif hasattr(p, "name"):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        n = int(np.prod(leaf.shape)) if len(leaf.shape) else 1
        out.append(("/".join(keys), n, n * np.dtype(leaf.dtype).itemsize))
    return out


def _group(stats, depth: int):
    groups: dict = {}
    for path, n, b in stats:
        prefix = "/".join(path.split("/")[:depth]) or "(root)"
        g = groups.setdefault(prefix, [0, 0, 0])
        g[0] += 1
        g[1] += n
        g[2] += b
    return groups


def _mb(nbytes: int) -> str:
    return f"{nbytes / 2**20:,.2f}"


def model_summary(params, name: str = "model", depth: int = 2,
                  opt_state=None, sn_u=None, batch_stats=None) -> str:
    """A torchinfo-style table for a flax param tree.

    ``params`` may be concrete arrays or ``ShapeDtypeStruct``s (e.g. from
    ``jax.eval_shape(trainer.init_state, key)``).  ``opt_state`` / ``sn_u``
    / ``batch_stats`` add non-trainable train-state rows so the bottom line
    is the actual HBM footprint of one replica of the train state.
    """
    stats = _leaf_stats(params)
    groups = _group(stats, depth)
    rows = [(k, *v) for k, v in sorted(groups.items())]

    name_w = max([len(r[0]) for r in rows] + [len("module"), 24])
    header = (f"{'module':<{name_w}}  {'tensors':>7}  {'params':>13}  "
              f"{'size (MB)':>10}")
    sep = "=" * len(header)
    lines = [sep, f"{name} — parameter summary", sep, header, "-" * len(header)]
    for mod, t, n, b in rows:
        lines.append(f"{mod:<{name_w}}  {t:>7}  {n:>13,}  {_mb(b):>10}")
    total_t = sum(r[1] for r in rows)
    total_n = sum(r[2] for r in rows)
    total_b = sum(r[3] for r in rows)
    lines.append("-" * len(header))
    lines.append(f"{'trainable params':<{name_w}}  {total_t:>7}  "
                 f"{total_n:>13,}  {_mb(total_b):>10}")

    state_b = total_b
    for label, tree in (("optimizer state", opt_state),
                        ("spectral-norm u", sn_u),
                        ("batch stats", batch_stats)):
        if tree is None:
            continue
        s = _leaf_stats(tree)
        t = len(s)
        n = sum(x[1] for x in s)
        b = sum(x[2] for x in s)
        state_b += b
        lines.append(f"{label:<{name_w}}  {t:>7}  {n:>13,}  {_mb(b):>10}")
    if state_b != total_b:
        lines.append("-" * len(header))
        lines.append(f"{'train state / replica':<{name_w}}  {'':>7}  "
                     f"{'':>13}  {_mb(state_b):>10}")
    lines.append(sep)
    return "\n".join(lines)


def train_state_summary(trainer, key, name: str, sample_x=None,
                        depth: int = 2) -> Optional[str]:
    """Summarize a trainer's full train state without allocating it.

    Uses ``jax.eval_shape`` over ``trainer.init_state`` — shapes only, zero
    device memory, no compile.  ``sample_x`` is required by the LC/E2E
    trainers' ``init_state(key, sample_x)`` signature.  Returns None instead
    of raising: a summary must never break a training run.
    """
    try:
        if sample_x is None:
            state = jax.eval_shape(trainer.init_state, key)
        else:
            sample = jax.ShapeDtypeStruct(np.asarray(sample_x).shape,
                                          np.asarray(sample_x).dtype)
            state = jax.eval_shape(trainer.init_state, key, sample)
        return model_summary(
            state.params, name=name, depth=depth,
            opt_state=getattr(state, "opt_state", None),
            sn_u=getattr(state, "sn_u", None) or None,
            batch_stats=getattr(state, "batch_stats", None) or None)
    except Exception as e:  # pragma: no cover - defensive
        print(f"[summary] skipped ({type(e).__name__}: {e})", flush=True)
        return None
