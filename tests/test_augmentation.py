"""Augmentation statistics and determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.data.augmentation import AugmentationConfig, augment_batch
from simulgen_vae_tpu.data.image_augmentation import (
    apply_outline_preserving_augmentations,
    augment_images,
)


def _batch(n=256, t=8, c=4, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((n, t, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((n, t, c)).astype(np.float32)))


def test_disabled_is_identity():
    x, p = _batch()
    cfg = AugmentationConfig(enabled=False)
    out = augment_batch(jax.random.PRNGKey(0), x, p, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_deterministic_given_key():
    x, p = _batch()
    a = augment_batch(jax.random.PRNGKey(7), x, p)
    b = augment_batch(jax.random.PRNGKey(7), x, p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(jax.random.PRNGKey(8), x, p)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_noise_only_statistics():
    x, p = _batch(n=512)
    cfg = AugmentationConfig(noise_prob=1.0, noise_level=0.05,
                             scaling_prob=0, mixup_prob=0)
    out = augment_batch(jax.random.PRNGKey(0), x, p, cfg)
    resid = np.asarray(out - x)
    assert abs(resid.std() - 0.05) < 0.005
    assert abs(resid.mean()) < 0.005


def test_probabilities_roughly_respected():
    """~half the samples should be modified with noise_prob=.5 only."""
    x, p = _batch(n=1000)
    cfg = AugmentationConfig(noise_prob=0.5, scaling_prob=0, mixup_prob=0)
    out = augment_batch(jax.random.PRNGKey(1), x, p, cfg)
    changed = (np.asarray(out) != np.asarray(x)).any(axis=(1, 2))
    assert 0.4 < changed.mean() < 0.6


def test_mixup_bounds():
    """Mixup lam clamped to [.1,.9]: output stays within segment bounds."""
    x = jnp.ones((64, 4, 4))
    p = jnp.zeros((64, 4, 4))
    cfg = AugmentationConfig(noise_prob=0, scaling_prob=0, mixup_prob=1.0)
    out = np.asarray(augment_batch(jax.random.PRNGKey(2), x, p, cfg))
    assert out.min() >= 0.1 - 1e-6
    assert out.max() <= 0.9 + 1e-6


def test_scaling_range():
    x = jnp.ones((256, 4, 4))
    p = jnp.zeros_like(x)
    cfg = AugmentationConfig(noise_prob=0, scaling_prob=1.0, mixup_prob=0)
    out = np.asarray(augment_batch(jax.random.PRNGKey(3), x, p, cfg))
    assert out.min() >= 0.9 - 1e-6 and out.max() <= 1.1 + 1e-6


def test_image_aug_shapes_and_determinism():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 16, 16)).astype(np.float32))
    a = apply_outline_preserving_augmentations(jax.random.PRNGKey(0), imgs,
                                               prob=1.0)
    assert a.shape == imgs.shape
    b = apply_outline_preserving_augmentations(jax.random.PRNGKey(0), imgs,
                                               prob=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    flat = imgs.reshape(8, -1)
    out = augment_images(jax.random.PRNGKey(1), flat)
    assert out.shape == flat.shape


def test_image_aug_preserves_value_range():
    """Border-padded bilinear resampling cannot exceed input range."""
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((4, 16, 16)).astype(np.float32))
    for seed in range(5):
        out = apply_outline_preserving_augmentations(
            jax.random.PRNGKey(seed), imgs, prob=1.0
        )
        assert float(out.min()) >= float(imgs.min()) - 1e-5
        assert float(out.max()) <= float(imgs.max()) + 1e-5
