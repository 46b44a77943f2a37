"""SimulGen-VAE TPU: a TPU-native physics-simulation generative surrogate framework.

A ground-up JAX/XLA/Pallas rebuild of the SimulGenVAE system (reference:
leesihun/SimulGen-VAE): a hierarchical 1-D convolutional VAE that compresses
simulation snapshots ``[parameters, timesteps, nodes]`` into a main latent plus
per-level hierarchical latents, and a latent-conditioner network (MLP for CSV
parameters, CNN/ViT for images) that regresses those latents from design
parameters so new simulations are generated without running the solver.

TPU-first design decisions (vs the torch reference):

* Data layout is ``[batch, time, nodes]`` (NWC) end-to-end: the node/channel
  axis lands on the TPU's 128-lane dimension and the huge ``nodes -> filters``
  embedding becomes a single MXU matmul.  The reference transposes to
  channels-first for cuDNN (``SimulGen-VAE.py:282``); we never do.
* The whole train step -- augmentation, spectral-norm power iteration,
  forward, ELBO, optimizer -- is one jitted function; epochs run as a
  ``lax.scan`` over batches with the dataset resident in HBM.
* Parallelism is ``jax.sharding`` GSPMD over a device mesh (data axis +
  optional model axis for the node-dim embedding), not NCCL DDP.
* bf16 compute with f32 params/loss accumulation; Pallas kernels for fused
  GroupNorm+GELU on the hot path.
"""

__version__ = "0.1.0"

from simulgen_vae_tpu import config  # noqa: F401
