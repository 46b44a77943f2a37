"""VAE reconstruction evaluation — vectorized best-of-N latent extraction.

Mirrors reference ``modules/utils.py:428-561`` (``evaluate_vae_reconstruction``)
but instead of a Python loop decoding one sample at a time, everything is a
jitted batch computation: encode all samples once, run ``recon_iter``
stochastic reparameterize+decode attempts (mode='fix' deterministic decode,
matching utils.py:499), and keep the argmin-MSE latents per sample.

Outputs keep the reference artifact contract:
``latent_vectors [P, latent_dim_end]``, ``hierarchical_latent_vectors
[P, n_hier, latent_dim]``, per-sample loss, reconstructions, total loss —
saved as ``model_save/latent_vectors.npy`` / ``model_save/xs.npy`` by the CLI.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simulgen_vae_tpu.models.decoder import reparameterize
from simulgen_vae_tpu.models.vae import VAE


# jit cache keyed by (model identity, recon_iter): flax modules with list
# fields aren't hashable, so they can't be static jit args directly.
_EVAL_FN_CACHE = {}


def _get_chunk_fn(model: VAE, recon_iter: int):
    key = (id(model), recon_iter)
    if key not in _EVAL_FN_CACHE:
        fn = jax.jit(partial(_evaluate_chunk, model, recon_iter=recon_iter))
        _EVAL_FN_CACHE[key] = (model, fn)  # keep model alive (id stability)
    return _EVAL_FN_CACHE[key][1]


def _evaluate_chunk(model: VAE, params, chunk, key, recon_iter: int):
    """Best-of-recon_iter evaluation for one [B, T, N] chunk."""
    variables = {"params": params}
    mu, log_var, xs = model.apply(variables, chunk, method=VAE.encode)
    log_var = jnp.clip(log_var, -30.0, 30.0)
    std = jnp.exp(0.5 * log_var)

    def attempt(i):
        k = jax.random.fold_in(key, i)
        k_z, k_dec = jax.random.split(k)
        z = reparameterize(k_z, mu, std)
        gen, _, _ = model.apply(variables, z, xs, mode="fix",
                                method=VAE.decode, rngs={"sample": k_dec})
        # per-sample MSE (reference compares batch-of-1 MSE, utils.py:502)
        mse = jnp.mean((gen.astype(jnp.float32) - chunk.astype(jnp.float32)) ** 2,
                       axis=(1, 2))
        return z, gen, mse

    def body(carry, i):
        best_z, best_gen, best_mse = carry
        z, gen, mse = attempt(i)
        better = mse < best_mse
        best_z = jnp.where(better[:, None], z, best_z)
        best_gen = jnp.where(better[:, None, None], gen, best_gen)
        best_mse = jnp.where(better, mse, best_mse)
        return (best_z, best_gen, best_mse), None

    z0, gen0, mse0 = attempt(0)
    if recon_iter > 1:
        (z0, gen0, mse0), _ = jax.lax.scan(
            body, (z0, gen0, mse0), jnp.arange(1, recon_iter)
        )

    hier = jnp.stack(xs, axis=1) if xs else jnp.zeros((chunk.shape[0], 0, 0))
    return z0, hier, mse0, gen0


def _save_comparison_pngs(data: np.ndarray, reconstructed: np.ndarray,
                          recon_loss: np.ndarray, dataset_name: str,
                          save_dir: str | None = None,
                          max_images: int = 10) -> None:
    """Save first-``max_images`` original-vs-reconstruction comparison PNGs.

    Artifact parity with reference ``modules/utils.py:519-545``: one PNG per
    sample under ``checkpoints/<dataset slug>/reconstruction_sample_NNN.png``,
    plotting up to 3 channels, original solid / reconstruction dashed, MSE in
    each subplot title.  (dpi lowered 300->120: same artifact, ~6x smaller.)
    """
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if save_dir is None:
        slug = (dataset_name.replace(" ", "_").replace("(", "")
                .replace(")", "").lower())
        save_dir = os.path.join("checkpoints", slug)
    os.makedirs(save_dir, exist_ok=True)

    n = min(max_images, data.shape[0])
    for j in range(n):
        try:
            original = np.asarray(data[j])
            recon = reconstructed[j]
            num_ch = min(3, original.shape[0])
            plt.figure(figsize=(12, 6))
            for ch in range(num_ch):
                plt.subplot(num_ch, 1, ch + 1)
                plt.plot(original[ch], label="Original", alpha=0.7)
                plt.plot(recon[ch], label="Reconstructed", alpha=0.7,
                         linestyle="--")
                plt.title(f"Channel {ch + 1} - Sample {j + 1} - "
                          f"MSE: {recon_loss[j]:.4E}")
                plt.legend()
                plt.grid(True, alpha=0.3)
            plt.tight_layout()
            plt.savefig(f"{save_dir}/reconstruction_sample_{j + 1:03d}.png",
                        dpi=120, bbox_inches="tight")
            plt.close()
        except Exception as e:  # parity: reference warns and continues
            print(f"Warning: Could not save reconstruction image for "
                  f"sample {j + 1}: {e}")
    print(f"Saved {n} reconstruction images to: {save_dir}/")


def evaluate_vae_reconstruction(model: VAE, params, data, key,
                                recon_iter: int = 1, batch_size: int = 16,
                                dataset_name: str = "Dataset",
                                verbose: bool = True,
                                save_images: bool = False,
                                save_dir: str | None = None
                                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                           np.ndarray, float]:
    """Evaluate reconstruction over [P, T, N] data in device-sized chunks.

    Returns (latent_vectors, hierarchical_latent_vectors, reconstruction_loss,
    reconstructed, total_loss) like the reference (utils.py:561).  With
    ``save_images=True`` also writes the reference's first-10 per-sample
    comparison PNGs (utils.py:519-545).
    """
    data = jnp.asarray(data)
    n = data.shape[0]
    zs, hiers, mses, gens = [], [], [], []
    chunk_fn = _get_chunk_fn(model, recon_iter)

    for start in range(0, n, batch_size):
        chunk = data[start: start + batch_size]
        pad = 0
        if chunk.shape[0] < batch_size:
            pad = batch_size - chunk.shape[0]
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], pad, axis=0)], axis=0
            )
        k = jax.random.fold_in(key, start)
        z, hier, mse, gen = chunk_fn(params, chunk, k)
        end = batch_size - pad
        zs.append(np.asarray(z[:end]))
        hiers.append(np.asarray(hier[:end]))
        mses.append(np.asarray(mse[:end]))
        gens.append(np.asarray(gen[:end]))

    latent_vectors = np.concatenate(zs, axis=0)
    hierarchical = np.concatenate(hiers, axis=0)
    recon_loss = np.concatenate(mses, axis=0)
    reconstructed = np.concatenate(gens, axis=0)
    total = float(recon_loss.sum())

    if verbose:
        # Per-sample line, parity with reference utils.py:517.
        for j in range(n):
            print(f"Parameter {j + 1} finished - MSE: {recon_loss[j]:.4E}")
        print(f"Total {dataset_name} MSE loss: {recon_loss.mean():.3e}")

    if save_images:
        _save_comparison_pngs(np.asarray(data), reconstructed, recon_loss,
                              dataset_name, save_dir=save_dir)

    return latent_vectors, hierarchical, recon_loss, reconstructed, total


def evaluate_vae_simple(model: VAE, params, data, key,
                        batch_size: int = 16,
                        dataset_name: str = "Dataset") -> float:
    """Loss-only evaluation (reference utils.py:564-600)."""
    _, _, losses, _, total = evaluate_vae_reconstruction(
        model, params, data, key, recon_iter=1, batch_size=batch_size,
        dataset_name=dataset_name, verbose=False,
    )
    return total
