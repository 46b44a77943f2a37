"""Image/CSV ingestion: cv2-parity threshold pipeline, natural sort."""

import os

import numpy as np
import pytest

from simulgen_vae_tpu.data.images import (
    clear_images,
    natsorted,
    read_latent_conditioner_dataset,
    read_latent_conditioner_dataset_img,
    read_latent_conditioner_dataset_img_pca,
)


def test_natsorted():
    names = ["img10.png", "img2.png", "img1.png", "img20.png"]
    assert natsorted(names) == ["img1.png", "img2.png", "img10.png",
                                "img20.png"]


def test_clear_images_threshold():
    img = np.array([[0, 100, 150, 151, 255]], dtype=np.uint8)
    out = clear_images(img, threshold=150)
    # cv2.THRESH_BINARY: > threshold -> 255 else 0 (150 itself -> 0)
    np.testing.assert_array_equal(out, [[0, 0, 0, 255, 255]])


@pytest.fixture
def image_dir(tmp_path):
    import cv2

    d = tmp_path / "images"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in [1, 2, 10]:  # exercise natural ordering
        img = (rng.random((64, 64)) * 255).astype(np.uint8)
        img[:, :i] = 255  # distinguishing stripe widens with index
        cv2.imwrite(str(d / f"shape{i}.png"), img)
    return tmp_path, d


def test_read_images(image_dir):
    base, d = image_dir
    data, shape = read_latent_conditioner_dataset_img(
        "/images", ".png", im_size=32, base_dir=str(base)
    )
    assert data.shape == (3, 32 * 32)
    assert shape == (32, 32)
    assert set(np.unique(data)) <= {0.0, 255.0}


def test_read_images_pca(image_dir, tmp_path):
    base, d = image_dir
    data, shape = read_latent_conditioner_dataset_img_pca(
        "/images", ".png", pca_components=4, im_size=32, base_dir=str(base),
        save_dir=str(tmp_path / "save"),
    )
    assert data.shape[0] == 3
    assert shape == (data.shape[1],)


def test_read_images_rejects_bad_type(image_dir):
    base, _ = image_dir
    with pytest.raises(NotImplementedError):
        read_latent_conditioner_dataset_img("/images", ".bmp",
                                            base_dir=str(base))


def test_read_csv(tmp_path):
    p = tmp_path / "params.csv"
    p.write_text("1.0,2.0,3.0\n4.0,5.0,6.0\n")
    data = read_latent_conditioner_dataset(str(p))
    np.testing.assert_allclose(data, [[1, 2, 3], [4, 5, 6]])
