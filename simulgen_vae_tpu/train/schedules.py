"""Learning-rate schedules as pure functions of epoch (scan/jit friendly).

Mirrors the torch schedulers the reference steps once per epoch:

* ``cosine_warm_restarts``  <- ``CosineAnnealingWarmRestarts(T_0=E//4,
  T_mult=2, eta_min=LR*1e-4)`` (``modules/train.py:94-96``)
* ``lc_warmup_cosine``      <- ``LinearLR(start_factor=.01, total_iters=100)``
  then ``CosineAnnealingLR(T_max=E-100, eta_min=1e-8)``
  (``modules/latent_conditioner.py:195-211``)
* ``cosine_annealing``      <- ``CosineAnnealingLR(T_max=E, eta_min=1e-8)``
  (``modules/latent_conditioner_e2e.py:140-144``)

All accept traced (jnp) epoch values.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_warm_restarts(epoch, base_lr: float, t_0: int, t_mult: int = 2,
                         eta_min: float = 0.0):
    """lr(epoch) for torch CosineAnnealingWarmRestarts stepped per epoch.

    Cycle i spans ``[T_0*(t_mult^i - 1), T_0*(t_mult^{i+1} - 1))`` with length
    ``T_i = T_0 * t_mult^i`` (closed form valid for t_mult >= 2; t_mult == 1
    falls back to modular arithmetic).
    """
    epoch = jnp.asarray(epoch, jnp.float32)
    t_0 = max(int(t_0), 1)
    if t_mult == 1:
        t_cur = jnp.mod(epoch, t_0)
        t_i = float(t_0)
    else:
        i = jnp.floor(jnp.log(epoch / t_0 * (t_mult - 1) + 1) / np.log(t_mult))
        start = t_0 * (jnp.power(float(t_mult), i) - 1) / (t_mult - 1)
        t_i = t_0 * jnp.power(float(t_mult), i)
        t_cur = epoch - start
    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(np.pi * t_cur / t_i)) / 2


def lc_warmup_cosine(epoch, base_lr: float, total_epochs: int,
                     warmup_epochs: int = 100, start_factor: float = 0.01,
                     eta_min: float = 1e-8):
    """Linear warmup (factor start->1 over warmup) then cosine annealing.

    Matches torch semantics when the warmup scheduler steps for epochs
    [0, warmup) and the cosine scheduler steps afterwards: at epoch ``e`` the
    applied lr uses ``min(e, warmup)`` warmup steps then ``max(e - warmup, 0)``
    cosine steps.
    """
    epoch = jnp.asarray(epoch, jnp.float32)
    warm = jnp.minimum(epoch, warmup_epochs)
    factor = start_factor + (1.0 - start_factor) * warm / warmup_epochs
    warm_lr = base_lr * factor

    t_max = max(total_epochs - warmup_epochs, 1)
    t = jnp.clip(epoch - warmup_epochs, 0, t_max)
    cos_lr = eta_min + (base_lr - eta_min) * (1 + jnp.cos(np.pi * t / t_max)) / 2

    return jnp.where(epoch < warmup_epochs, warm_lr, cos_lr)


def cosine_annealing(epoch, base_lr: float, total_epochs: int,
                     eta_min: float = 1e-8):
    epoch = jnp.asarray(epoch, jnp.float32)
    t = jnp.clip(epoch, 0, total_epochs)
    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(np.pi * t / total_epochs)) / 2
