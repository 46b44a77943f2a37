"""Reconstruction comparison: conditioner+decoder vs true-latent decoder.

Mirrors reference ``modules/reconstruction_evaluator.py:18-275``: for each
sample, run the latent conditioner, inverse-scale the predicted latents
(a traceable affine here — no sklearn/numpy round trip), decode with
mode='fix', and plot a 2x2 dual-view comparison (nodal/temporal, x1e6
scaling) against the original and the true-latent reconstruction.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from simulgen_vae_tpu.models.vae import VAE


class ReconstructionEvaluator:
    def __init__(self, model: VAE, params, num_time: int, debug_mode: int = 0):
        self.model = model
        self.params = params
        self.num_time = num_time
        self.debug_mode = debug_mode
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, z, xs_stacked, key):
        xs_list = [xs_stacked[:, i] for i in range(xs_stacked.shape[1])]
        out, _, _ = self.model.apply(
            {"params": self.params}, z, xs_list, mode="fix",
            method=VAE.decode, rngs={"sample": key},
        )
        return out

    def reconstruct_from_latents(self, y_pred, y2_pred, latent_scaler,
                                 xs_scaler, key=None):
        """Inverse-scale predicted latents and decode (rec_eval.py:160-178).

        ``y_pred [B, z_end]``, ``y2_pred [B, n_hier, hier_dim]``.
        Returns ``[B, time, node]`` fields.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        z = latent_scaler.inverse_transform(jnp.asarray(y_pred))
        b, nh, hd = y2_pred.shape
        xs_flat = xs_scaler.inverse_transform(
            jnp.asarray(y2_pred).reshape(b, nh * hd)
        )
        xs = xs_flat.reshape(b, nh, hd)
        return np.asarray(self._decode(z, xs, key))

    def evaluate_reconstruction_comparison(
            self, conditioner_fn: Callable, conditioner_inputs,
            y1_true, y2_true, original_data, latent_vectors_scaler, xs_scaler,
            save_dir: str = "checkpoints", max_plots: int = 10,
            save_plots: bool = True):
        """Compare VAE+conditioner vs VAE-only reconstructions.

        Args:
          conditioner_fn: callable ``x -> (y1_pred, y2_pred)`` (already bound
            to trained params, deterministic).
          conditioner_inputs: conditioner inputs ``[P, ...]`` (scaled).
          y1_true / y2_true: scaled true latents (for the VAE-only branch).
          original_data: ``[P, time, node]`` scaled fields.

        Returns dict with per-sample MSEs of both branches.
        """
        y1_pred, y2_pred = conditioner_fn(jnp.asarray(conditioner_inputs))
        predicted = self.reconstruct_from_latents(
            np.asarray(y1_pred), np.asarray(y2_pred),
            latent_vectors_scaler, xs_scaler,
        )
        true_recon = self.reconstruct_from_latents(
            np.asarray(y1_true), np.asarray(y2_true),
            latent_vectors_scaler, xs_scaler,
        )

        orig = np.asarray(original_data)
        pred_mse = np.mean((orig - predicted) ** 2, axis=(1, 2))
        true_mse = np.mean((orig - true_recon) ** 2, axis=(1, 2))

        if save_plots:
            os.makedirs(save_dir, exist_ok=True)
            for i in range(min(max_plots, orig.shape[0])):
                self._plot_comparison(i, orig[i], predicted[i], true_recon[i],
                                      save_dir)

        if self.debug_mode >= 1:
            for i in range(orig.shape[0]):
                print(f"Sample {i}: VAE+LC MSE {pred_mse[i]:.3e}  "
                      f"VAE-only MSE {true_mse[i]:.3e}")

        return {"pred_mse": pred_mse, "true_mse": true_mse,
                "predicted": predicted, "true_recon": true_recon}

    def evaluate_reconstruction_comparison_e2e(
            self, conditioner_fn, e2e_arrays, latent_vectors_scaler,
            xs_scaler, save_dir: str = "checkpoints", max_plots: int = 10,
            save_plots: bool = True):
        """E2E-dataset variant (reference rec_eval.py:106-158): same
        comparison driven from (x, y1, y2, target) quadruplet arrays."""
        x, y1, y2, target = e2e_arrays
        return self.evaluate_reconstruction_comparison(
            conditioner_fn, x, y1, y2, target, latent_vectors_scaler,
            xs_scaler, save_dir=save_dir, max_plots=max_plots,
            save_plots=save_plots,
        )

    def _plot_comparison(self, idx, original, predicted, true_recon, save_dir):
        """2x2 dual-view comparison plot (rec_eval.py:180-256).

        All arrays are [time, node]; values scaled x1e6 like the reference.

        NOTE: this is deliberate *presentation-artifact parity* — titles,
        labels, colors, figure geometry, and the x1e6 scaling intentionally
        reproduce the reference's matplotlib output so downstream tooling
        and eyes see identical plots.  The transcription is confined to
        this plotting method (and evaluation/plotter.py, same rationale);
        all computation feeding it is the TPU-native redesign.
        """
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nt, nn = original.shape
        time_indices = [int(nt * 0.25), int(nt * 0.5), int(nt * 0.75)]
        node_indices = [int(nn * 0.25), int(nn * 0.5), int(nn * 0.75)]
        colors = ["blue", "green", "red"]

        fig, axes = plt.subplots(2, 2, figsize=(16, 12))
        fig.suptitle(f"Sample {idx} - Dual-View Reconstruction Comparison",
                     fontsize=16)

        t_mid = nt // 2
        for arr, label, style in ((original, "Original", "."),
                                  (predicted, "VAE+LC", "."),
                                  (true_recon, "VAE-only", ".")):
            v = arr[t_mid, :] * 1e6
            axes[0, 0].plot(v, style, label=f"{label} [{v.min():.1f}, {v.max():.1f}]",
                            alpha=0.8, markersize=1)
        axes[0, 0].set_title(f"Nodal View - Spatial Distribution (t={t_mid})")
        axes[0, 0].set_xlabel("Node Index")
        axes[0, 0].set_ylabel("Value (x1e6)")
        axes[0, 0].legend()
        axes[0, 0].grid(True, alpha=0.3)

        axes[0, 1].set_title("Nodal View - Multiple Time Snapshots")
        for i, t_idx in enumerate(time_indices):
            axes[0, 1].plot(original[t_idx, :] * 1e6, "--", color=colors[i],
                            alpha=0.7, linewidth=1, label=f"Original t={t_idx}")
            axes[0, 1].plot(predicted[t_idx, :] * 1e6, "-", color=colors[i],
                            alpha=0.8, linewidth=1, label=f"VAE+LC t={t_idx}")
        axes[0, 1].set_xlabel("Node Index")
        axes[0, 1].legend(bbox_to_anchor=(1.05, 1), loc="upper left")
        axes[0, 1].grid(True, alpha=0.3)

        n_mid = nn // 2
        for arr, label in ((original, "Original"), (predicted, "VAE+LC"),
                           (true_recon, "VAE-only")):
            v = arr[:, n_mid] * 1e6
            axes[1, 0].plot(v, "-", label=f"{label} [{v.min():.1f}, {v.max():.1f}]",
                            alpha=0.8)
        axes[1, 0].set_title(f"Temporal View - Time Evolution (node={n_mid})")
        axes[1, 0].set_xlabel("Time Index")
        axes[1, 0].legend()
        axes[1, 0].grid(True, alpha=0.3)

        axes[1, 1].set_title("Temporal View - Multiple Node Traces")
        for i, n_idx in enumerate(node_indices):
            axes[1, 1].plot(original[:, n_idx] * 1e6, "--", color=colors[i],
                            alpha=0.7, linewidth=1, label=f"Original n={n_idx}")
            axes[1, 1].plot(predicted[:, n_idx] * 1e6, "-", color=colors[i],
                            alpha=0.8, linewidth=1, label=f"VAE+LC n={n_idx}")
        axes[1, 1].set_xlabel("Time Index")
        axes[1, 1].legend(bbox_to_anchor=(1.05, 1), loc="upper left")
        axes[1, 1].grid(True, alpha=0.3)

        plt.tight_layout()
        plt.savefig(f"{save_dir}/reconstruction_dual_view_{idx}.png", dpi=150,
                    bbox_inches="tight")
        plt.close(fig)
