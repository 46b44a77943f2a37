"""PCA preprocessor: sklearn parity, patch mode, save/load."""

import numpy as np
import pytest

from simulgen_vae_tpu.data.pca import PCAPreprocessor, _LinearPCA


def _images(n=20, side=16, seed=0):
    rng = np.random.default_rng(seed)
    # low-rank-ish images: few spatial modes + noise
    base = np.stack([
        np.outer(np.sin(np.linspace(0, (k + 1) * np.pi, side)),
                 np.cos(np.linspace(0, (k + 2) * np.pi, side)))
        for k in range(4)
    ])
    w = rng.standard_normal((n, 4))
    return np.tensordot(w, base, axes=1) + 0.01 * rng.standard_normal(
        (n, side, side))


def test_linear_pca_matches_sklearn():
    from sklearn.decomposition import PCA as SkPCA

    x = _images().reshape(20, -1)
    ours = _LinearPCA(4).fit(x)
    sk = SkPCA(n_components=4).fit(x)

    ours_t = ours.transform(x)
    sk_t = sk.transform(x)
    # components are sign-ambiguous; compare per-column up to sign
    for j in range(4):
        a, b = ours_t[:, j], sk_t[:, j]
        err = min(np.abs(a - b).max(), np.abs(a + b).max())
        assert err < 1e-3, (j, err)
    np.testing.assert_allclose(ours.explained_variance_ratio_,
                               sk.explained_variance_ratio_, atol=1e-5)


def test_full_pca_square_output(tmp_path):
    imgs = _images()
    pre = PCAPreprocessor(n_components=9, save_dir=str(tmp_path))
    pre.fit(imgs)
    out = pre.transform(imgs)
    assert out.shape == (20, 1, 3, 3)
    assert pre.get_output_channels() == 1


def test_component_count_rounds_to_square(tmp_path):
    imgs = _images()
    pre = PCAPreprocessor(n_components=10, save_dir=str(tmp_path))
    pre.fit(imgs)
    # 10 -> ceil(sqrt(10))^2 = 16 (pca_preprocessor.py:74-80)
    assert pre.output_shape == (4, 4)


def test_patch_pca(tmp_path):
    imgs = _images()
    pre = PCAPreprocessor(n_components=16, patch_size=8, save_dir=str(tmp_path))
    pre.fit(imgs)
    out = pre.transform(imgs)
    # 16x16 images, patch 8 -> 2x2 grid, 16//4 = 4 components per patch
    assert out.shape == (20, 4, 2, 2)
    assert pre.get_output_channels() == 4


def test_patch_size_must_divide(tmp_path):
    imgs = _images()
    pre = PCAPreprocessor(n_components=16, patch_size=7, save_dir=str(tmp_path))
    with pytest.raises(ValueError):
        pre.fit(imgs)


def test_save_load_roundtrip(tmp_path):
    imgs = _images()
    pre = PCAPreprocessor(n_components=9, save_dir=str(tmp_path))
    pre.fit(imgs)
    out1 = pre.transform(imgs)

    pre2 = PCAPreprocessor(n_components=9, save_dir=str(tmp_path)).load()
    out2 = pre2.transform(imgs)
    np.testing.assert_allclose(out1, out2, atol=1e-6)

    with pytest.raises(FileNotFoundError):
        PCAPreprocessor(n_components=999, save_dir=str(tmp_path)).load()


def test_reconstruction_quality():
    """4 true modes -> 4 components reconstruct nearly exactly."""
    imgs = _images()
    flat = imgs.reshape(20, -1)
    pca = _LinearPCA(4).fit(flat)
    recon = pca.inverse_transform(pca.transform(flat))
    rel = np.linalg.norm(recon - flat) / np.linalg.norm(flat)
    assert rel < 0.05
