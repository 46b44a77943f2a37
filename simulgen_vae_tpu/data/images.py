"""Image / CSV ingestion for the latent conditioner.

Pixel-exact port of reference ``modules/latent_conditioner.py:20-104``:
cv2 grayscale read -> resize 256x256 INTER_CUBIC -> binary threshold at 150
("Clear_images" — despite the reference's Canny comments it is a plain
threshold) -> flatten, in natural-sorted filename order.  The CSV reader uses
pandas with ``header=None`` like the reference.

cv2/pandas are optional at import time (graceful error if absent).
"""

from __future__ import annotations

import os
import re
from typing import List, Tuple

import numpy as np

DEFAULT_IMAGE_SIZE = 256


def natsorted(names: List[str]) -> List[str]:
    """Natural sort (file2 < file10), matching natsort.natsorted for the
    simple filename case the reference uses."""

    def key(s):
        return [int(t) if t.isdigit() else t.lower()
                for t in re.split(r"(\d+)", s)]

    return sorted(names, key=key)


def clear_images(image: np.ndarray, threshold: int = 150) -> np.ndarray:
    """Binary threshold at ``threshold`` -> {0, 255} (lc.py:20-29)."""
    import cv2

    if image.ndim == 3:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    _, binary = cv2.threshold(image, threshold, 255, cv2.THRESH_BINARY)
    return binary


def read_latent_conditioner_dataset_img(
        param_dir: str, param_data_type: str,
        im_size: int = DEFAULT_IMAGE_SIZE,
        base_dir: str | None = None) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Read a directory of images -> (flattened [N, im_size^2], (H, W)).

    ``param_dir`` is joined to the cwd like the reference (lc.py:32-33) unless
    ``base_dir`` overrides it.
    """
    import cv2

    if param_data_type not in (".jpg", ".png"):
        raise NotImplementedError("Data type not supported")

    file_dir = (base_dir or os.getcwd()) + param_dir
    files = [f for f in os.listdir(file_dir) if f.endswith(param_data_type)]
    files = natsorted(files)

    raw = np.zeros((len(files), im_size, im_size))
    for i, fname in enumerate(files):
        im = cv2.imread(os.path.join(file_dir, fname), 0)
        resized = cv2.resize(im, (im_size, im_size),
                             interpolation=cv2.INTER_CUBIC)
        raw[i] = clear_images(resized)

    return raw.reshape(len(files), -1), (im_size, im_size)


def read_latent_conditioner_dataset_img_pca(
        param_dir: str, param_data_type: str, pca_components: int = 256,
        pca_patch_size: int = 0, im_size: int = DEFAULT_IMAGE_SIZE,
        base_dir: str | None = None,
        save_dir: str = "model_save") -> Tuple[np.ndarray, Tuple[int, ...]]:
    """PCA_MLP mode (lc.py:59-98): raw resized images -> PCA coefficients."""
    import cv2

    from simulgen_vae_tpu.data.pca import PCAPreprocessor

    if param_data_type not in (".jpg", ".png"):
        raise NotImplementedError("PCA_MLP mode only supports .jpg/.png files")

    file_dir = (base_dir or os.getcwd()) + param_dir
    files = [f for f in os.listdir(file_dir) if f.endswith(param_data_type)]
    files = natsorted(files)

    raw = np.zeros((len(files), im_size, im_size))
    for i, fname in enumerate(files):
        im = cv2.imread(os.path.join(file_dir, fname), 0)
        raw[i] = cv2.resize(im, (im_size, im_size),
                            interpolation=cv2.INTER_CUBIC)

    pre = PCAPreprocessor(
        n_components=pca_components,
        patch_size=pca_patch_size if pca_patch_size > 0 else None,
        save_dir=save_dir,
    )
    pre.fit(raw)
    coeffs = pre.transform(raw)
    flat = np.asarray(coeffs).reshape(coeffs.shape[0], -1)
    return flat, (flat.shape[1],)


def read_latent_conditioner_dataset(param_dir: str,
                                    param_data_type: str = ".csv") -> np.ndarray:
    """CSV reader (lc.py:100-104): pandas, no header."""
    import pandas as pd

    return pd.read_csv(param_dir, header=None).values
