"""Min-max scaling with reference-parity semantics, jittable transforms.

Reference behavior (``modules/data_preprocess.py:65-195``):

* feature range ``(-0.7, 0.7)``, features = node columns;
* fit on at most 50k randomly sampled (param, time) rows, ``np.random.seed(42)``;
* scaler pickled to ``model_save/scaler.pkl`` as an sklearn ``MinMaxScaler``.

We keep the exact sampled-fit (same seed, same index arithmetic) so the fitted
statistics match the reference bit-for-bit on identical data, but the
transform itself is a pure affine ``x * scale + min`` that jits onto TPU and
differentiates (the reference's sklearn round-trip through numpy severs
gradients in its E2E trainer, ``latent_conditioner_e2e.py:66-92``).  For
artifact parity we still export a real sklearn ``MinMaxScaler`` pickle.
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import numpy as np


class MinMaxScaler:
    """Functional min-max scaler: X * scale_ + min_ (sklearn-compatible stats).

    ``scale_``/``min_`` follow sklearn's definitions so pickles round-trip:
    ``scale_ = (fmax - fmin) / (data_max - data_min)`` (zero ranges -> 1),
    ``min_   = fmin - data_min * scale_``.
    """

    def __init__(self, feature_range: Tuple[float, float] = (-0.7, 0.7)):
        self.feature_range = feature_range
        self.data_min_: Optional[np.ndarray] = None
        self.data_max_: Optional[np.ndarray] = None
        self.scale_: Optional[np.ndarray] = None
        self.min_: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "MinMaxScaler":
        x = np.asarray(x)
        fmin, fmax = self.feature_range
        self.data_min_ = np.min(x, axis=0)
        self.data_max_ = np.max(x, axis=0)
        data_range = self.data_max_ - self.data_min_
        # sklearn _handle_zeros_in_scale: constant features scale by 1
        safe_range = np.where(data_range == 0.0, 1.0, data_range)
        self.scale_ = (fmax - fmin) / safe_range
        self.min_ = fmin - self.data_min_ * self.scale_
        return self

    def transform(self, x):
        # Pure affine: works on numpy or jax arrays, traceable under jit.
        return x * self.scale_ + self.min_

    def inverse_transform(self, x):
        return (x - self.min_) / self.scale_

    def fit_transform(self, x: np.ndarray):
        return self.fit(x).transform(x)

    # -- persistence -------------------------------------------------------

    def to_sklearn(self):
        """Export an sklearn MinMaxScaler with identical statistics."""
        from sklearn.preprocessing import MinMaxScaler as SkScaler

        sk = SkScaler(feature_range=self.feature_range)
        sk.data_min_ = np.asarray(self.data_min_, dtype=np.float64)
        sk.data_max_ = np.asarray(self.data_max_, dtype=np.float64)
        sk.data_range_ = sk.data_max_ - sk.data_min_
        sk.scale_ = np.asarray(self.scale_, dtype=np.float64)
        sk.min_ = np.asarray(self.min_, dtype=np.float64)
        sk.n_features_in_ = sk.scale_.shape[-1] if sk.scale_.ndim else 1
        sk.n_samples_seen_ = 1
        return sk

    @classmethod
    def from_sklearn(cls, sk) -> "MinMaxScaler":
        out = cls(feature_range=tuple(sk.feature_range))
        out.data_min_ = np.asarray(sk.data_min_)
        out.data_max_ = np.asarray(sk.data_max_)
        out.scale_ = np.asarray(sk.scale_)
        out.min_ = np.asarray(sk.min_)
        return out

    def save(self, path: str) -> None:
        """Pickle as an sklearn MinMaxScaler (artifact parity with reference)."""
        with open(path, "wb") as f:
            pickle.dump(self.to_sklearn(), f)

    @classmethod
    def load(cls, path: str) -> "MinMaxScaler":
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, cls):
            return obj
        return cls.from_sklearn(obj)


def data_scaler(fom_data: np.ndarray, num_time: int, num_node: int,
                save_path: Optional[str] = "model_save/scaler.pkl",
                max_fit_samples: int = 50000, seed: int = 42
                ) -> Tuple[np.ndarray, Tuple[int, ...], MinMaxScaler]:
    """Fit + apply the (-0.7, 0.7) min-max scaler on [P, T, N] data.

    Sampled-fit semantics mirror reference ``modules/data_preprocess.py:90-116``
    exactly (same seed, same flat-index arithmetic) so statistics match.
    Returns ``(scaled_data, data_shape, scaler)``.
    """
    total_samples = fom_data.shape[0] * fom_data.shape[1]

    max_samples = min(max_fit_samples, total_samples // 10)
    if max_samples < 1000:
        max_samples = min(1000, total_samples)

    np.random.seed(seed)
    if total_samples > max_samples:
        sample_indices = np.random.choice(total_samples, max_samples, replace=False)
    else:
        sample_indices = np.arange(total_samples)

    param_indices = sample_indices // num_time
    time_indices = sample_indices % num_time
    representative = fom_data[param_indices, time_indices, :]

    scaler = MinMaxScaler(feature_range=(-0.7, 0.7))
    scaler.fit(representative)

    flat = fom_data.reshape(-1, num_node)
    scaled = scaler.transform(flat).astype(np.float32).reshape(fom_data.shape)

    if save_path is not None:
        scaler.save(save_path)

    return scaled, scaled.shape[1:], scaler


def latent_conditioner_scaler(data: np.ndarray, name: Optional[str] = None
                              ) -> Tuple[np.ndarray, MinMaxScaler]:
    """Per-array (-0.7, 0.7) scaler with 3-D flattening.

    Mirrors reference ``modules/data_preprocess.py:167-195`` including the
    empty-data error.
    """
    original_shape = data.shape
    if original_shape[0] == 0:
        raise ValueError(
            f"Empty data array detected with shape {original_shape}. "
            "Please check your data loading configuration."
        )

    if len(original_shape) == 3:
        reshaped = data.reshape(original_shape[0], -1)
    else:
        reshaped = data

    scaler = MinMaxScaler(feature_range=(-0.7, 0.7))
    scaled = scaler.fit_transform(reshaped)

    if len(original_shape) == 3:
        scaled = scaled.reshape(original_shape)

    if name is not None:
        scaler.save(name)

    return scaled, scaler
