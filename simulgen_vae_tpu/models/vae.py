"""Top-level VAE (reference ``modules/VAE_network.py:33-164``), NWC layout.

``__call__(x)`` with ``x: [batch, time, nodes]`` returns
``(x_hat, recon_loss, [kl_main, kl_hier...], recon_loss_mse)`` exactly like
the reference forward (VAE_network.py:79-117): encode, clamp log_var to +-30,
reparameterize (std clamped [1e-8, 10]), decode with hierarchical
conditioning, reconstruction loss in the configured flavor plus always-on MSE
for monitoring.

RNG: supply ``rngs={'sample': key}``; the reparameterizations at the top level
and inside each decoder level each fold their own stream.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from simulgen_vae_tpu.losses import kl, make_recon_loss_pair
from simulgen_vae_tpu.models.decoder import Decoder, reparameterize
from simulgen_vae_tpu.models.encoder import Encoder


class VAE(nn.Module):
    latent_dim: int                 # main latent (z) dimension
    hierarchical_dim: int           # per-level hierarchical latent dimension
    num_filter_enc: Sequence[int]
    num_filter_dec: Sequence[int]
    num_node: int
    num_time: int
    lossfun: str = "MSE"
    small: bool = True
    dtype: Any = jnp.float32
    remat: bool = False  # gradient checkpointing on the residual blocks

    def setup(self):
        self.encoder = Encoder(
            self.latent_dim, self.hierarchical_dim, self.num_filter_enc,
            self.num_time, self.small, self.dtype, self.remat,
        )
        self.decoder = Decoder(
            self.latent_dim, self.hierarchical_dim, self.num_filter_dec,
            self.num_node, self.num_time, self.small, self.dtype, self.remat,
        )

    def __call__(self, x, fused_readout_loss: bool = False):
        """Forward + losses.  ``fused_readout_loss=True`` (train path, TPU)
        computes the reconstruction losses inside the fused Pallas readout
        kernel — x_hat is never materialized and is returned as None."""
        mu, log_var, xs = self.encoder(x)

        log_var = jnp.clip(log_var, -30.0, 30.0)
        std = jnp.exp(0.5 * log_var)
        z = reparameterize(self.make_rng("sample"), mu, std)

        if fused_readout_loss:
            (recon_loss, recon_loss_mse), kl_losses, _ = self.decoder(
                z, xs, x_target=x, lossfun=self.lossfun
            )
            x_hat = None
        else:
            x_hat, kl_losses, _ = self.decoder(z, xs)
            # f32 loss math with low-precision-only VJP residuals: avoids
            # the 1.22 GB f32 x_hat residual XLA otherwise saves for the
            # backward at flagship geometry (losses.make_recon_loss_pair).
            recon_loss, recon_loss_mse = make_recon_loss_pair(self.lossfun)(
                x_hat, x)
        kl_loss = kl(mu.astype(jnp.float32), log_var.astype(jnp.float32))

        return x_hat, recon_loss, [kl_loss] + list(kl_losses), recon_loss_mse

    def encode(self, x):
        """(mu, log_var, xs) — the hierarchical posterior parameters."""
        return self.encoder(x)

    def decode(self, z, xs=None, mode="random", frozen_zs=None):
        """Decode latents; mode='fix' gives the deterministic decode used for
        generation (reconstruction_evaluator.py:160-178)."""
        return self.decoder(z, xs, mode=mode, frozen_zs=frozen_zs)

    def generate(self, z, xs=None):
        """First-class generation API: conditioner latents -> field.

        Deterministic decode (mode='fix').  Returns ``[B, time, nodes]``.
        The reference buries this inside its evaluator
        (reconstruction_evaluator.py:160-178).
        """
        x_hat, _, _ = self.decoder(z, xs, mode="fix")
        return x_hat
