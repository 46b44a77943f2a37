"""PCA preprocessing for image inputs — on-device SVD, sklearn-free.

Mirrors reference ``modules/pca_preprocessor.py:8-243``: full-image or
patch-based PCA with square-arranged outputs for CNN input, save/load under
``model_save/`` with the same filename convention.  The decomposition is
centered-data SVD (identical math to sklearn PCA) computed with
``jnp.linalg.svd`` so fit/transform run on the accelerator, and transform is
a plain matmul usable inside jitted pipelines.
"""

from __future__ import annotations

import math
import os
import pickle
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


class _LinearPCA:
    """Minimal PCA core: components from centered-data SVD (sklearn math)."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None   # [k, d]
        self.explained_variance_ratio_: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "_LinearPCA":
        x = jnp.asarray(x, jnp.float32)
        self.mean_ = np.asarray(jnp.mean(x, axis=0))
        xc = x - self.mean_
        k = min(self.n_components, min(xc.shape))
        # economy SVD on device; right singular vectors are the components
        _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
        self.components_ = np.asarray(vt[:k])
        var = np.asarray(s) ** 2
        total = var.sum()
        self.explained_variance_ratio_ = var[:k] / (total + 1e-12)
        self.n_components = k
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(
            (jnp.asarray(x, jnp.float32) - self.mean_) @ self.components_.T
        )

    def inverse_transform(self, coeffs: np.ndarray) -> np.ndarray:
        return np.asarray(
            jnp.asarray(coeffs, jnp.float32) @ self.components_ + self.mean_
        )


class PCAPreprocessor:
    """Full-image or patch PCA with the reference's I/O conventions."""

    def __init__(self, n_components: int = 1024,
                 patch_size: Optional[int] = None,
                 save_dir: str = "model_save"):
        self.n_components = n_components
        self.patch_size = patch_size
        self.save_dir = save_dir
        self.pca: Optional[_LinearPCA] = None
        self.is_fitted = False
        self.original_shape: Optional[Tuple[int, int]] = None
        self.output_shape: Optional[Tuple[int, ...]] = None
        os.makedirs(save_dir, exist_ok=True)

    def _get_pca_filename(self) -> str:
        if self.patch_size:
            return f"pca_patch{self.patch_size}_comp{self.n_components}.pkl"
        return f"pca_full_comp{self.n_components}.pkl"

    # -- fitting -----------------------------------------------------------

    def fit(self, images: np.ndarray, save: bool = True) -> "PCAPreprocessor":
        if images.ndim == 3:
            n, h, w = images.shape
            self.original_shape = (h, w)
            flat = images.reshape(n, -1)
        else:
            flat = images
            side = int(math.sqrt(flat.shape[1]))
            self.original_shape = (side, side)

        if self.patch_size:
            self._fit_patch(flat)
        else:
            self._fit_full(flat)
        if save:
            self.save()
        return self

    def _fit_full(self, flat: np.ndarray) -> None:
        # square-arrange the component count (pca_preprocessor.py:74-80)
        out_side = int(math.sqrt(self.n_components))
        if out_side * out_side != self.n_components:
            out_side = int(math.ceil(math.sqrt(self.n_components)))
            self.n_components = out_side * out_side
        self.pca = _LinearPCA(self.n_components).fit(flat)
        self.n_components = self.pca.n_components
        self.output_shape = (out_side, out_side)
        self.is_fitted = True

    def _extract_patches(self, flat: np.ndarray) -> np.ndarray:
        h, w = self.original_shape
        p = self.patch_size
        if h % p != 0 or w % p != 0:
            raise ValueError(
                f"Image size {self.original_shape} not divisible by patch "
                f"size {p}"
            )
        n = flat.shape[0]
        imgs = flat.reshape(n, h // p, p, w // p, p)
        # [n, gh, gw, p, p] -> [n*gh*gw, p*p]
        patches = imgs.transpose(0, 1, 3, 2, 4).reshape(-1, p * p)
        return patches

    def _fit_patch(self, flat: np.ndarray) -> None:
        h, w = self.original_shape
        per_dim = h // self.patch_size
        n_patches = per_dim * per_dim
        per_patch = max(self.n_components // n_patches, 1)
        if self.n_components // n_patches < 1:
            self.n_components = n_patches
        patches = self._extract_patches(flat)
        self.pca = _LinearPCA(per_patch).fit(patches)
        self.output_shape = (per_dim, per_dim, self.pca.n_components)
        self.is_fitted = True

    # -- transform ---------------------------------------------------------

    def transform(self, images: np.ndarray) -> np.ndarray:
        """Returns [N, 1, s, s] (full) or [N, c, gh, gw] (patch) float32 —
        CNN-ready channel-first arrays like the reference's torch tensors."""
        if not self.is_fitted:
            raise ValueError("PCA not fitted. Call fit() first or load().")
        flat = (images.reshape(images.shape[0], -1)
                if images.ndim == 3 else images)

        if self.patch_size:
            n = flat.shape[0]
            per_dim, _, cpp = self.output_shape
            patches = self._extract_patches(flat)
            coeffs = self.pca.transform(patches)
            coeffs = coeffs.reshape(n, per_dim, per_dim, cpp)
            return coeffs.transpose(0, 3, 1, 2).astype(np.float32)

        coeffs = self.pca.transform(flat)
        s0, s1 = self.output_shape
        n = coeffs.shape[0]
        out = np.zeros((n, s0 * s1), np.float32)
        out[:, : coeffs.shape[1]] = coeffs
        return out.reshape(n, 1, s0, s1)

    # -- persistence -------------------------------------------------------

    def save(self) -> None:
        if not self.is_fitted:
            raise ValueError("Cannot save unfitted PCA model")
        path = os.path.join(self.save_dir, self._get_pca_filename())
        with open(path, "wb") as f:
            pickle.dump({
                "pca_mean": self.pca.mean_,
                "pca_components": self.pca.components_,
                "explained_variance_ratio": self.pca.explained_variance_ratio_,
                "n_components": self.n_components,
                "patch_size": self.patch_size,
                "original_shape": self.original_shape,
                "output_shape": self.output_shape,
                "is_fitted": self.is_fitted,
            }, f)

    def load(self) -> "PCAPreprocessor":
        path = os.path.join(self.save_dir, self._get_pca_filename())
        if not os.path.exists(path):
            raise FileNotFoundError(f"PCA model not found at {path}")
        with open(path, "rb") as f:
            d = pickle.load(f)
        core = _LinearPCA(d["n_components"])
        core.mean_ = d["pca_mean"]
        core.components_ = d["pca_components"]
        core.explained_variance_ratio_ = d["explained_variance_ratio"]
        core.n_components = core.components_.shape[0]
        self.pca = core
        self.n_components = d["n_components"]
        self.patch_size = d["patch_size"]
        self.original_shape = d["original_shape"]
        self.output_shape = d["output_shape"]
        self.is_fitted = d["is_fitted"]
        return self

    def get_output_shape(self):
        if not self.is_fitted:
            raise ValueError("PCA not fitted")
        return self.output_shape

    def get_output_channels(self) -> int:
        if not self.is_fitted:
            raise ValueError("PCA not fitted")
        return self.output_shape[2] if self.patch_size else 1
