#!/usr/bin/env python
"""Benchmark: VAE train-step throughput on the flagship workload.

Measures samples/sec/chip for the jitted hierarchical-VAE training epoch on
the reference's documented workload geometry (484 params x 200 timesteps x
95008 nodes, README.md:128-134; encoder filters 1024/512/256/128 from
preset.txt) with bf16 compute.  Falls back to a scaled-down geometry on CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against an estimated PyTorch-A100 eager-mode
baseline (the reference publishes no numbers — BASELINE.md).  Estimate:
  * model cost/step  : analytic FLOPs (fwd) x 3 for fwd+bwd
  * A100 sustained   : 60 TFLOP/s (eager fp32 torch with TF32 matmuls
    typically sustains 20-40% of the 156 TFLOP/s TF32 peak on conv nets;
    we take an optimistic 40% so the reported speedup is conservative)
North-star target is >=5x this baseline (BASELINE.json).
"""

import json
import time

import numpy as np


def vae_fwd_flops(batch, t, node, filters, z=32, hier=8, expansion=5):
    """Analytic forward FLOPs for one batch (dominant terms, small variant)."""
    total = 0.0
    # encoder: node->f0 k=1 conv + per-level k=1 conv + k=3 res conv
    chans = [node] + list(filters)
    for i in range(len(filters)):
        cin, cout = chans[i], chans[i + 1]
        total += 2 * batch * t * cin * cout            # k=1 conv
        total += 2 * batch * t * cout * cout * 3       # res k=3
        total += 2 * batch * (cout * t) * hier         # xs linear
    total += 2 * batch * (filters[-1] * t) * 2 * z

    # decoder (reversed filters): blocks + 5x bottleneck res + heads
    dec = list(filters)[::-1]
    total += 2 * batch * z * z * t + 2 * batch * t * z * dec[0] * 5
    for i in range(len(dec) - 1):
        cin, cout = dec[i], dec[i + 1]
        total += 2 * batch * t * cin * cout * 3        # dec block k=3
        m = cout * expansion
        total += 2 * batch * t * (cout * m + m * m * 5 + m * cout)  # res
        if i < len(dec) - 2:
            total += 2 * batch * t * (cout * cout * 3 * 2            # cond_z
                                      + (2 * cout) * (2 * cout) * 3 * 2
                                      + hier * hier * t / t
                                      + hier * cout * 5)
    total += 2 * batch * t * dec[-1] * node            # readout k=1
    return total


def estimate_a100_baseline_sps(batch, t, node, filters):
    """Estimated reference throughput (samples/sec) on one A100, eager torch."""
    flops_per_step = vae_fwd_flops(batch, t, node, filters) * 3  # fwd+bwd
    a100_sustained = 60e12
    steps_per_sec = a100_sustained / flops_per_step
    return steps_per_sec * batch


def main():
    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    if on_tpu:
        num_node, num_time, batch = 95008, 200, 16
        filters = [1024, 512, 256, 128]
        resident_samples = 64   # HBM-resident subset of the 484-sample set
        dtype = "bfloat16"
        epochs = 3
    else:
        num_node, num_time, batch = 2048, 50, 16
        filters = [64, 32, 16, 8]
        resident_samples = 32
        dtype = "float32"
        epochs = 2

    cfg = VAEConfig(
        num_param=resident_samples, num_time=num_time, num_node=num_node,
        latent_dim_end=32, latent_dim=8, num_filter_enc=filters,
        small=True, n_epochs=100, batch_size=batch, lr=1e-3, alpha=1e6,
        dtype=dtype,
    )
    trainer = VAETrainer(cfg, donate=False)

    rng = np.random.default_rng(0)
    data = (rng.standard_normal((resident_samples, num_time, num_node))
            .astype(np.float32) * 0.3)
    data = jnp.asarray(data, jnp.dtype(dtype))

    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)

    # Warmup / compile
    state, _ = trainer._train_epoch(state, data, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)

    steps_per_epoch = resident_samples // batch
    t0 = time.perf_counter()
    for i in range(epochs):
        state, metrics = trainer._train_epoch(state, data,
                                              jax.random.PRNGKey(2 + i))
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t0

    n_steps = epochs * steps_per_epoch
    samples_per_sec = n_steps * batch / elapsed
    n_chips = jax.device_count()
    sps_per_chip = samples_per_sec / n_chips

    baseline = estimate_a100_baseline_sps(batch, num_time, num_node, filters)
    vs_baseline = sps_per_chip / baseline

    result = {
        "metric": "samples/sec/chip (VAE train step, "
                  f"{resident_samples}x{num_time}x{num_node}, bf16)"
                  if on_tpu else
                  "samples/sec/chip (VAE train step, CPU-scaled geometry)",
        "value": round(sps_per_chip, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
