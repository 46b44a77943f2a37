"""GSPMD sharding rules for the VAE state and data.

The scale axis of this model family is ``num_node`` (95008 in the flagship
workload): the encoder embedding kernel ``[1, num_node, f0]``, the decoder
readout kernel ``[1, f_last, num_node]``, its bias/GroupNorm vectors, and the
activations ``[B, T, num_node]`` all carry it (SURVEY §5 "long-context").
Rule: shard every node-sized dimension over the ``model`` mesh axis, batch
dimensions over ``data``, replicate the rest.  XLA inserts the psum for the
embedding contraction and the group-stat reductions.

With the default single-axis mesh (model=1) everything degenerates to plain
data parallelism: gradients are combined by XLA's all-reduce exactly where
the reference intended NCCL DDP (SURVEY §2.7).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, shape=None) -> NamedSharding:
    """Sharding for [batch, time, node] simulation arrays.

    Axes that don't divide evenly by their mesh axis fall back to
    replication (e.g. a 10-sample dataset on an 8-way data axis); the batch
    gathered inside the train step is still constrained to the data axis.
    """
    data_ok = shape is None or shape[0] % mesh.shape["data"] == 0
    node_ok = shape is None or shape[-1] % mesh.shape["model"] == 0
    spec = P("data" if data_ok else None, None,
             "model" if node_ok else None)
    return NamedSharding(mesh, spec)


def _leaf_spec(leaf, num_node: int) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    spec = [None] * len(shape)
    for i, d in enumerate(shape):
        if d == num_node:
            spec[i] = "model"
            break  # shard at most one dim per leaf
    return P(*spec)


def param_shardings(tree: Any, mesh: Mesh, num_node: int) -> Any:
    """NamedSharding pytree for params / opt_state / sn_u.

    Any leaf with a node-sized dimension is sharded on ``model``; everything
    else is replicated (and reduced over ``data`` by GSPMD during grads).
    """
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, num_node)), tree
    )


def place_global(x, sharding: NamedSharding) -> jax.Array:
    """Place host data onto a (possibly multi-process) sharding.

    Single-controller: plain ``device_put``.  Multi-process
    (``jax.process_count() > 1``): ``device_put`` of a process-local array
    fails for non-addressable devices, so the global ``jax.Array`` is built
    via ``make_array_from_callback`` — every process holds the full host
    value (reference semantics: each torchrun rank loads the whole dataset,
    SimulGen-VAE.py:277-283) and each device fetches only its own shard, so
    only the addressable slices ever cross host->device.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # Already a global array (e.g. a restored checkpoint): no host copy
        # exists, so reshard on device if needed.
        return x if x.sharding == sharding else jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_state(state: Any, mesh: Mesh, num_node: int) -> Any:
    """Place a train state onto the mesh according to the sharding rules."""
    shardings = param_shardings(state, mesh, num_node)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)
    # Multi-process: state was initialized identically on every process
    # (same PRNG key); assemble global arrays shard-by-shard.
    return jax.tree.map(place_global, state, shardings)


def shard_batch(data, mesh: Mesh) -> jax.Array:
    return place_global(data, batch_sharding(mesh, np.shape(data)))
