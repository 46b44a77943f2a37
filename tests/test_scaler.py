"""Scaler tests: sklearn parity, round-trip, sampled-fit reference semantics."""

import numpy as np
import pytest

from simulgen_vae_tpu.data.scaler import (
    MinMaxScaler,
    data_scaler,
    latent_conditioner_scaler,
)


def test_sklearn_parity():
    from sklearn.preprocessing import MinMaxScaler as SkScaler

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 8)) * 5 + 2

    ours = MinMaxScaler((-0.7, 0.7)).fit(x)
    sk = SkScaler(feature_range=(-0.7, 0.7)).fit(x)

    np.testing.assert_allclose(ours.transform(x), sk.transform(x), rtol=1e-10)
    np.testing.assert_allclose(ours.scale_, sk.scale_)
    np.testing.assert_allclose(ours.min_, sk.min_)


def test_round_trip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((50, 4))
    s = MinMaxScaler().fit(x)
    np.testing.assert_allclose(s.inverse_transform(s.transform(x)), x, atol=1e-12)


def test_constant_feature():
    x = np.ones((10, 3))
    x[:, 1] = np.arange(10)
    s = MinMaxScaler((-0.7, 0.7)).fit(x)
    out = s.transform(x)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 0], -0.7)  # sklearn maps constants to fmin


def test_save_load_sklearn_pickle(tmp_path):
    """The pickled artifact is a genuine sklearn scaler (artifact parity)."""
    import pickle

    rng = np.random.default_rng(2)
    x = rng.standard_normal((20, 5))
    s = MinMaxScaler().fit(x)
    path = str(tmp_path / "scaler.pkl")
    s.save(path)

    with open(path, "rb") as f:
        sk = pickle.load(f)
    from sklearn.preprocessing import MinMaxScaler as SkScaler

    assert isinstance(sk, SkScaler)
    np.testing.assert_allclose(sk.transform(x), np.asarray(s.transform(x)),
                               rtol=1e-6)

    loaded = MinMaxScaler.load(path)
    np.testing.assert_allclose(loaded.transform(x), s.transform(x))


def test_data_scaler_sampled_fit_matches_reference_recipe(tmp_path):
    """Replicate the reference fit (data_preprocess.py:90-116) with sklearn
    directly and check our data_scaler produces identical statistics."""
    from sklearn.preprocessing import MinMaxScaler as SkScaler

    rng = np.random.default_rng(3)
    P, T, N = 30, 40, 16
    data = rng.standard_normal((P, T, N)).astype(np.float64)

    # reference recipe
    total = P * T
    max_samples = min(50000, total // 10)
    if max_samples < 1000:
        max_samples = min(1000, total)
    np.random.seed(42)
    if total > max_samples:
        idx = np.random.choice(total, max_samples, replace=False)
    else:
        idx = np.arange(total)
    rep = data[idx // T, idx % T, :]
    sk = SkScaler(feature_range=(-0.7, 0.7)).fit(rep)

    scaled, shape, scaler = data_scaler(data, T, N, save_path=None)
    np.testing.assert_allclose(scaler.data_min_, sk.data_min_)
    np.testing.assert_allclose(scaler.data_max_, sk.data_max_)
    ref_scaled = sk.transform(data.reshape(-1, N)).reshape(data.shape)
    np.testing.assert_allclose(scaled, ref_scaled, atol=1e-6)
    assert shape == (T, N)


def test_latent_conditioner_scaler_3d(tmp_path):
    rng = np.random.default_rng(4)
    data = rng.standard_normal((10, 3, 8))
    scaled, scaler = latent_conditioner_scaler(data, None)
    assert scaled.shape == data.shape
    assert scaled.min() >= -0.7 - 1e-9 and scaled.max() <= 0.7 + 1e-9

    with pytest.raises(ValueError):
        latent_conditioner_scaler(np.zeros((0, 5)), None)


def test_transform_is_jit_traceable():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    s = MinMaxScaler().fit(x)

    @jax.jit
    def f(v):
        return s.inverse_transform(s.transform(v))

    np.testing.assert_allclose(np.asarray(f(jnp.asarray(x))), x, atol=1e-5)

    # and it differentiates (the whole point for E2E training)
    g = jax.grad(lambda v: jnp.sum(s.transform(v)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.broadcast_to(s.scale_, x.shape),
                               rtol=1e-5)
