#!/usr/bin/env python
"""Probe the wall-vs-device gap: per-epoch Python dispatch vs one scanned
multi-epoch dispatch (VERDICT r2 weak-item 1: 87.6 ms wall vs 77.7 ms traced
device per step, ~10 ms unexplained).

Runs the flagship bench geometry both ways on the real chip:
  A) bench.py's current loop — one `_train_epoch` dispatch per epoch,
     scalar-readback sync at block boundaries;
  B) `_train_epochs` — lax.scan over epochs, ONE dispatch per block.

If the gap is host dispatch / donation bookkeeping, (B) recovers it; if it
is device-side (scan while-loop overhead), (B) ties (A).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from simulgen_vae_tpu.config import VAEConfig  # noqa: E402
from simulgen_vae_tpu.train.vae_trainer import VAETrainer  # noqa: E402


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        num_node, num_time, batch = 95008, 200, 16
        filters = [1024, 512, 256, 128]
        resident, dtype = 64, "bfloat16"
        epochs_per_block, n_blocks = 3, 2
    else:
        num_node, num_time, batch = 2048, 50, 16
        filters = [64, 32, 16, 8]
        resident, dtype = 32, "float32"
        epochs_per_block, n_blocks = 3, 2

    cfg = VAEConfig(num_param=resident, num_time=num_time, num_node=num_node,
                    latent_dim_end=32, latent_dim=8, num_filter_enc=filters,
                    small=True, n_epochs=100, batch_size=batch, lr=1e-3,
                    alpha=1e6, dtype=dtype)
    trainer = VAETrainer(cfg, donate=True, fast_rng=on_tpu)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(
        (resident, num_time, num_node)).astype(np.float32) * 0.3,
        jnp.dtype(dtype))
    steps_per_epoch = resident // batch

    def sps(dt, n_epochs):
        return n_epochs * steps_per_epoch * batch / dt

    # ---- A: per-epoch dispatch ------------------------------------------
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, m = trainer._train_epoch(state, data, jax.random.PRNGKey(1))
    _ = float(m["loss"])  # compile + sync
    a_sps = []
    k = 2
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(epochs_per_block):
            state, m = trainer._train_epoch(state, data, jax.random.PRNGKey(k))
            k += 1
        _ = float(m["loss"])
        a_sps.append(sps(time.perf_counter() - t0, epochs_per_block))
    del state

    # ---- B: one scanned dispatch per block ------------------------------
    state = trainer.init_state(jax.random.PRNGKey(0))
    keys = jnp.stack([jax.random.PRNGKey(100 + i)
                      for i in range(epochs_per_block)])
    state, m = trainer._train_epochs(state, data, keys)
    _ = float(m["loss"][-1])  # compile + sync
    b_sps = []
    for b in range(n_blocks):
        keys = jnp.stack([jax.random.PRNGKey(200 + b * 10 + i)
                          for i in range(epochs_per_block)])
        t0 = time.perf_counter()
        state, m = trainer._train_epochs(state, data, keys)
        _ = float(m["loss"][-1])
        b_sps.append(sps(time.perf_counter() - t0, epochs_per_block))

    print(f"A per-epoch dispatch : {[round(v,1) for v in a_sps]} samples/s "
          f"(median {np.median(a_sps):.1f})")
    print(f"B scanned block      : {[round(v,1) for v in b_sps]} samples/s "
          f"(median {np.median(b_sps):.1f})")


if __name__ == "__main__":
    main()
