"""Orbax checkpointing: params + optimizer + spectral-norm state + step.

The reference only saves final weights (``train.py:252-253`` — no optimizer
state, no mid-run checkpoints, no resume; SURVEY §5).  Here training is fully
resumable: the whole train state (params, opt_state, sn_u, epoch) checkpoints
asynchronously every N epochs with retention, and ``restore`` reproduces the
exact state (sharding-aware via orbax).

Artifact-parity helpers keep the reference's file layout:
``model_save/latent_vectors.npy``, ``model_save/xs.npy``, scaler pickles.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_epochs: int = 50):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_interval = save_interval_epochs
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True,
            ),
        )

    def maybe_save(self, state: Any, epoch: int, force: bool = False) -> bool:
        if not force and (epoch % self.save_interval != 0):
            return False
        if self._mngr.latest_step() == epoch:
            return False  # already saved this step (e.g. preemption landing
            # on an interval epoch, or the final epoch coinciding with one)
        self._mngr.save(epoch, args=ocp.args.StandardSave(state))
        return True

    def save(self, state: Any, epoch: int) -> None:
        self.maybe_save(state, epoch, force=True)

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``abstract_state`` (a concrete state
        from ``init_state`` works; its values are replaced)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()


def save_flax_model(path: str, variables: dict) -> None:
    """Serialize model variables (flax msgpack) to a single file.

    Artifact parity with the reference's ``torch.save(model, ...)`` files
    (``model_save/SimulGen-VAE``, ``model_save/LatentConditioner``) — same
    paths, a safe serialization format instead of pickled code.
    """
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_flax_model(path: str, template: dict) -> dict:
    """Restore variables saved by :func:`save_flax_model` into the structure
    of ``template``."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_latents(save_dir: str, latent_vectors: np.ndarray,
                 hierarchical: np.ndarray) -> None:
    """Reference artifact layout (SimulGen-VAE.py:340-341)."""
    os.makedirs(save_dir, exist_ok=True)
    np.save(os.path.join(save_dir, "latent_vectors"), latent_vectors)
    np.save(os.path.join(save_dir, "xs"), hierarchical)


def save_l2_loss(path: str, reconstruction_loss: np.ndarray) -> None:
    """SimulGen-VAE_L2_loss.txt artifact (SimulGen-VAE.py:343-344)."""
    np.savetxt(path, reconstruction_loss, fmt="%e")
