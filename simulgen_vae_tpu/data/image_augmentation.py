"""On-device outline-preserving image augmentation for LC training.

Vectorized jax port of reference ``modules/latent_conditioner.py:107-159``
(``apply_outline_preserving_augmentations``): whole-call gate (p=prob),
batch-gated horizontal flip (p=.3, per-sample 50%), +-1px roll (p=.5), small
rotation (+-5 deg, p=.3) and 0.95-1.05 scaling (p=.3) via affine resampling
with border padding.  The reference loops over the batch in Python and calls
``grid_sample`` per sample; here rotation+scale share one vmapped bilinear
resample and everything is branch-free under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _affine_resample(img, cos_a, sin_a, scale):
    """Bilinear sample of ``img [H, W]`` under rotation+scale about the
    center, border padding (torch grid_sample padding_mode='border').

    torch affine_grid maps output coords -> input coords in normalized
    [-1, 1] space; for theta = [[s*cos, -s*sin, 0], [s*sin, s*cos, 0]] the
    source point for output (x, y) is (s*(x cos - y sin), s*(x sin + y cos)).
    """
    h, w = img.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = scale * (gx * cos_a - gy * sin_a)
    src_y = scale * (gx * sin_a + gy * cos_a)
    px = jnp.clip((src_x + 1.0) * w / 2.0 - 0.5, 0.0, w - 1.0)
    py = jnp.clip((src_y + 1.0) * h / 2.0 - 0.5, 0.0, h - 1.0)

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = px - x0
    fy = py - y0

    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def apply_outline_preserving_augmentations(key: jax.Array, x: jax.Array,
                                           prob: float = 0.5) -> jax.Array:
    """Augment a batch of square images ``[B, H, W]``; pure fn of the key."""
    b, h, w = x.shape
    keys = jax.random.split(key, 10)
    original = x

    # Horizontal flip: batch gate p=.3, per-sample mask p=.5
    flip_gate = jax.random.uniform(keys[1]) < 0.3
    flip_mask = (jax.random.uniform(keys[2], (b, 1, 1)) < 0.5) & flip_gate
    x = jnp.where(flip_mask, jnp.flip(x, axis=2), x)

    # +-1 px translation via roll: batch gate p=.5
    shift_gate = jax.random.uniform(keys[3]) < 0.5
    shift_x = jnp.where(shift_gate, jax.random.randint(keys[4], (b,), -1, 2), 0)
    shift_y = jnp.where(shift_gate, jax.random.randint(keys[5], (b,), -1, 2), 0)

    def roll_one(img, sx, sy):
        return jnp.roll(jnp.roll(img, sx, axis=1), sy, axis=0)

    x = jax.vmap(roll_one)(x, shift_x, shift_y)

    # Rotation (+-5 deg, batch gate p=.3) and scale (0.95-1.05, p=.3),
    # fused into one resample per sample.
    rot_gate = jax.random.uniform(keys[6]) < 0.3
    angles = (jax.random.uniform(keys[7], (b,)) - 0.5) * 10.0  # degrees
    angles = jnp.where(rot_gate & (jnp.abs(angles) > 0.5), angles, 0.0)
    rad = angles * jnp.pi / 180.0

    scale_gate = jax.random.uniform(keys[8]) < 0.3
    scales = 0.95 + jax.random.uniform(keys[9], (b,)) * 0.1
    scales = jnp.where(scale_gate & (jnp.abs(scales - 1.0) > 0.01), scales, 1.0)

    needs_resample = (jnp.abs(rad) > 0) | (scales != 1.0)
    resampled = jax.vmap(_affine_resample)(x, jnp.cos(rad), jnp.sin(rad), scales)
    x = jnp.where(needs_resample[:, None, None], resampled, x)

    # Whole-call gate: with probability (1 - prob) return the input untouched
    # (latent_conditioner.py:108-109).
    apply_all = jax.random.uniform(keys[0]) < prob
    return jnp.where(apply_all, x, original)


def augment_images(key: jax.Array, x_flat: jax.Array, prob: float = 0.8,
                   apply_prob: float = 0.5) -> jax.Array:
    """Trainer-level wrapper matching latent_conditioner.py:244-248: with
    probability ``apply_prob`` reshape flat images to [B, H, W], run the
    outline-preserving augmentations (their own ``prob`` gate), re-flatten."""
    b = x_flat.shape[0]
    side = int(math.sqrt(x_flat.shape[-1]))
    k_gate, k_aug = jax.random.split(key)

    imgs = x_flat.reshape(b, side, side)
    augmented = apply_outline_preserving_augmentations(k_aug, imgs, prob=prob)
    gate = jax.random.uniform(k_gate) < apply_prob
    return jnp.where(gate, augmented, imgs).reshape(b, -1)
