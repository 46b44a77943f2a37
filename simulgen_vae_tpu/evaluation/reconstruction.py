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


def evaluate_vae_reconstruction(model: VAE, params, data, key,
                                recon_iter: int = 1, batch_size: int = 16,
                                dataset_name: str = "Dataset",
                                verbose: bool = True
                                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                           np.ndarray, float]:
    """Evaluate reconstruction over [P, T, N] data in device-sized chunks.

    Returns (latent_vectors, hierarchical_latent_vectors, reconstruction_loss,
    reconstructed, total_loss) like the reference (utils.py:561).
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
        print(f"Total {dataset_name} MSE loss: {recon_loss.mean():.3e}")

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
