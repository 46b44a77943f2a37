"""Device-mesh construction for data/model parallelism over ICI.

Replaces the reference's vestigial NCCL DDP (SURVEY §2.7: it initializes a
process group but never wraps the model or shards data — every rank trains an
identical copy).  Here parallelism is real: a ``jax.sharding.Mesh`` with a
``data`` axis (batch) and an optional ``model`` axis (the 95008-node
embedding/readout matmuls), with XLA GSPMD inserting the collectives.

Multi-host: call :func:`initialize_distributed` first (maps to
``jax.distributed.initialize``), then build the mesh over the global device
list — the reference's ``torchrun`` rendezvous equivalent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host setup (``jax.distributed.initialize``).

    No-op on a single host with no coordinator configured.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that owns artifact/plot/log writes (rank 0).

    The reference gates prints on rank 0 (SimulGen-VAE.py:228) but lets every
    DDP rank race on the same checkpoint/plot files (SURVEY §5 "race
    detection"); here every filesystem artifact outside orbax (which
    coordinates multi-host saves itself) is written by process 0 only.
    """
    return jax.process_index() == 0


def sync_processes(tag: str = "sync") -> None:
    """Barrier across processes (no-op single-controller)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh.

    Args:
      data: size of the data axis; defaults to ``n_devices // model``.
      model: size of the model axis (shards the node-dim matmuls).
      devices: device list (defaults to ``jax.devices()``).  Device order is
        preserved so contiguous devices share the model axis — the ICI-local
        grouping on TPU slices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
