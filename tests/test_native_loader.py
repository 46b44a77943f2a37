"""Native C++ batch assembler: build, parity with numpy, bf16 rounding."""

import numpy as np
import pytest

from simulgen_vae_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_gather_f32_matches_numpy(lib):
    rng = np.random.default_rng(0)
    src = rng.standard_normal((50, 7, 13)).astype(np.float32)
    idx = rng.integers(0, 50, size=16)
    out = native_loader.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    assert out.shape == (16, 7, 13)


def test_gather_bf16_matches_jax_cast(lib):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    src = rng.standard_normal((20, 33)).astype(np.float32) * 100
    # add edge cases
    src[0, :5] = [0.0, -0.0, np.inf, -np.inf, np.nan]
    idx = np.arange(20)
    out = native_loader.gather_rows(src, idx, to_bf16=True)
    ref = np.asarray(jnp.asarray(src).astype(jnp.bfloat16))
    a = out.view(np.uint16)
    b = ref.view(np.uint16)
    # NaN payloads may differ; compare NaN-ness separately
    nan_a = np.isnan(out.astype(np.float32))
    nan_b = np.isnan(ref.astype(np.float32))
    np.testing.assert_array_equal(nan_a, nan_b)
    np.testing.assert_array_equal(a[~nan_a], b[~nan_b])


def test_affine_rows_matches_numpy(lib):
    rng = np.random.default_rng(2)
    data = rng.standard_normal((40, 17)).astype(np.float32)
    scale = rng.standard_normal(17).astype(np.float32)
    minv = rng.standard_normal(17).astype(np.float32)
    expected = data * scale + minv
    ok = native_loader.affine_rows_inplace(data, scale, minv)
    assert ok
    np.testing.assert_allclose(data, expected, rtol=1e-6)


def test_numpy_fallback_without_native(monkeypatch):
    monkeypatch.setattr(native_loader, "get_lib", lambda: None)
    rng = np.random.default_rng(3)
    src = rng.standard_normal((10, 5)).astype(np.float32)
    idx = np.array([1, 3, 5])
    out = native_loader.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
