"""On-device, fully vectorized data augmentation for the jitted train step.

The reference applies per-sample augmentation in Python inside DataLoader
workers (``modules/augmentation.py:43-139``): Gaussian noise (p=.5, sigma=.05),
amplitude scaling (p=.5, x[0.9,1.1]), mixup (p=.5, Beta(.2,.2) clamped to
[.1,.9]), plus shift/cutout wired but disabled (p=0).  Here the whole thing is
one pure function of a PRNG key that vmaps/jits into the train step, so
augmentation costs ~nothing on TPU and never crosses the host boundary.

The reference accepts an ``augmentation_config`` ctor argument but silently
ignores it (``modules/augmentation.py:26-38``); we honor the config.

Batch layout is ``[batch, time, node]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentationConfig:
    """Defaults mirror reference ``modules/augmentation.py:26-38``."""

    noise_prob: float = 0.5
    noise_level: float = 0.05
    scaling_prob: float = 0.5
    scaling_range: tuple = (0.9, 1.1)
    shift_prob: float = 0.0
    shift_max: float = 0.0
    mixup_prob: float = 0.5
    mixup_alpha: float = 0.2
    cutout_prob: float = 0.0
    cutout_max: float = 0.0
    enabled: bool = True


def augment_batch(key: jax.Array, batch: jax.Array, partner: jax.Array,
                  config: AugmentationConfig = AugmentationConfig()) -> jax.Array:
    """Apply per-sample stochastic augmentation to a batch.

    Args:
      key: PRNG key.
      batch: ``[B, T, N]`` samples.
      partner: ``[B, T, N]`` independently drawn samples used as mixup
        partners (the reference draws partners from the whole dataset,
        ``augmentation.py:72-78``; callers gather random rows from the
        HBM-resident dataset to match).
      config: augmentation probabilities/strengths.

    Returns:
      Augmented batch, same shape/dtype.
    """
    if not config.enabled:
        return batch

    b = batch.shape[0]
    k_noise_p, k_noise, k_scale_p, k_scale, k_mix_p, k_mix, k_shift_p, \
        k_shift, k_cut_p, k_cut_len, k_cut_start = jax.random.split(key, 11)

    def psample(k):
        return jax.random.uniform(k, (b, 1, 1))

    # Gaussian noise
    if config.noise_prob > 0:
        noise = jax.random.normal(k_noise, batch.shape, batch.dtype)
        apply = psample(k_noise_p) < config.noise_prob
        batch = jnp.where(apply, batch + noise * config.noise_level, batch)

    # Amplitude scaling
    if config.scaling_prob > 0:
        lo, hi = config.scaling_range
        scale = jax.random.uniform(k_scale, (b, 1, 1), batch.dtype, lo, hi)
        apply = psample(k_scale_p) < config.scaling_prob
        batch = jnp.where(apply, batch * scale, batch)

    # Time shift (zero-filled), disabled by default like the reference
    if config.shift_prob > 0 and config.shift_max > 0:
        t = batch.shape[1]
        max_shift = int(t * config.shift_max)
        shift = jax.random.randint(k_shift, (b, 1, 1), -max_shift, max_shift + 1)
        idx = jnp.arange(t)[None, :, None]
        src = idx - shift
        valid = (src >= 0) & (src < t)
        gathered = jnp.take_along_axis(
            batch, jnp.clip(src, 0, t - 1).astype(jnp.int32), axis=1
        )
        shifted = jnp.where(valid, gathered, 0.0)
        apply = psample(k_shift_p) < config.shift_prob
        batch = jnp.where(apply, shifted, batch)

    # Mixup against the partner batch
    if config.mixup_prob > 0:
        a = config.mixup_alpha
        lam = jax.random.beta(k_mix, a, a, (b, 1, 1)).astype(batch.dtype)
        lam = jnp.clip(lam, 0.1, 0.9)
        apply = psample(k_mix_p) < config.mixup_prob
        mixed = lam * batch + (1.0 - lam) * partner
        batch = jnp.where(apply, mixed, batch)

    # Cutout (zero a random time segment), disabled by default
    if config.cutout_prob > 0 and config.cutout_max > 0:
        t = batch.shape[1]
        max_len = int(t * config.cutout_max)
        length = jax.random.randint(k_cut_len, (b, 1, 1), 1, max_len + 1)
        start = jax.random.randint(k_cut_start, (b, 1, 1), 0, t)
        idx = jnp.arange(t)[None, :, None]
        mask = (idx >= start) & (idx < start + length)
        apply = psample(k_cut_p) < config.cutout_prob
        batch = jnp.where(apply & mask, 0.0, batch)

    return batch
