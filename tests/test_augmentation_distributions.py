"""Distributional property tests for the on-device augmentation.

The reference's augmentations are numpy/torch draws in DataLoader workers
(modules/augmentation.py:43-139); ours are jax draws inside the jitted step.
Same math != same RNG, so parity is distributional: KS tests against the
spec distributions at n large enough that a wrong distribution fails hard
(alpha ~ 1e-3) while a correct one passes stably (fixed seeds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.data.augmentation import AugmentationConfig, augment_batch

scipy_stats = pytest.importorskip("scipy.stats")


def _collect(cfg, n_batches=40, b=64, t=4, nodes=8, seed=0):
    """Run augment_batch on zero inputs/partners to isolate each transform."""
    base = jnp.zeros((b, t, nodes))
    outs = []
    for i in range(n_batches):
        outs.append(np.asarray(
            augment_batch(jax.random.PRNGKey(seed + i), base, base, cfg)))
    return np.stack(outs)  # [n, b, t, nodes]


def test_noise_is_gaussian_with_spec_sigma():
    cfg = AugmentationConfig(noise_prob=1.0, scaling_prob=0, mixup_prob=0)
    out = _collect(cfg)
    draws = out.ravel()
    # all samples get noise at p=1; zeros input -> pure noise*level
    stat, p = scipy_stats.kstest(draws / 0.05, "norm")
    assert p > 1e-3, (stat, p)


def test_noise_probability_half():
    cfg = AugmentationConfig(noise_prob=0.5, scaling_prob=0, mixup_prob=0)
    out = _collect(cfg, n_batches=60)
    # a sample is augmented iff any nonzero appears in its [t, nodes] slab
    applied = (np.abs(out) > 0).any(axis=(2, 3)).ravel()
    frac = applied.mean()
    # n = 60*64 = 3840 Bernoulli(0.5) draws -> 5 sigma ~ 0.04
    assert abs(frac - 0.5) < 0.04, frac


def test_scaling_uniform_range():
    cfg = AugmentationConfig(noise_prob=0, scaling_prob=1.0, mixup_prob=0)
    base = jnp.ones((64, 4, 8))
    factors = []
    for i in range(60):
        out = np.asarray(
            augment_batch(jax.random.PRNGKey(i), base, base, cfg))
        factors.append(out[:, 0, 0])  # per-sample scalar factor
    draws = np.concatenate(factors)
    assert draws.min() >= 0.9 - 1e-6 and draws.max() <= 1.1 + 1e-6
    stat, p = scipy_stats.kstest(draws, scipy_stats.uniform(0.9, 0.2).cdf)
    assert p > 1e-3, (stat, p)
    # per-sample factor constant across (t, node) — amplitude scaling
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), base, base, cfg))
    assert np.allclose(out, out[:, :1, :1])


def test_mixup_lambda_clamped_beta():
    cfg = AugmentationConfig(noise_prob=0, scaling_prob=0, mixup_prob=1.0,
                             mixup_alpha=0.2)
    base = jnp.ones((64, 4, 8))
    partner = jnp.zeros((64, 4, 8))
    lams = []
    for i in range(120):
        out = np.asarray(
            augment_batch(jax.random.PRNGKey(i), base, partner, cfg))
        lams.append(out[:, 0, 0])  # out = lam*1 + (1-lam)*0 = lam
    draws = np.concatenate(lams)
    assert draws.min() >= 0.1 - 1e-6 and draws.max() <= 0.9 + 1e-6
    # Beta(.2,.2) clamped to [.1,.9]: ~58% of mass piles at the clamps
    beta = scipy_stats.beta(0.2, 0.2)
    at_lo = np.isclose(draws, 0.1, atol=1e-6).mean()
    at_hi = np.isclose(draws, 0.9, atol=1e-6).mean()
    assert abs(at_lo - beta.cdf(0.1)) < 0.03, (at_lo, beta.cdf(0.1))
    assert abs(at_hi - beta.sf(0.9)) < 0.03, (at_hi, beta.sf(0.9))
    interior = draws[(draws > 0.1 + 1e-6) & (draws < 0.9 - 1e-6)]
    # interior mass matches the truncated Beta
    cdf = lambda v: ((beta.cdf(v) - beta.cdf(0.1))
                     / (beta.cdf(0.9) - beta.cdf(0.1)))
    stat, p = scipy_stats.kstest(interior, cdf)
    assert p > 1e-3, (stat, p)


def test_disabled_transforms_do_nothing():
    cfg = AugmentationConfig(noise_prob=0, scaling_prob=0, mixup_prob=0,
                             shift_prob=0, cutout_prob=0)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((8, 4, 8)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(0), base, base, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
