#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench-configured train epoch.

Mirrors bench.py's flagship setup exactly (donated state, fast_rng RBG,
fused gather+augment default) so the device lane in the trace is the same
program the headline samples/sec number times.  Use with trace_summary.py:

    python scripts/trace_epoch.py --out /tmp/jax-trace-epoch
    python scripts/trace_summary.py trace /tmp/jax-trace-epoch --top 40
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jax-trace-epoch")
    ap.add_argument("--nodes", type=int, default=95008)
    ap.add_argument("--time", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=1,
                    help="epochs inside the trace window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    on_tpu = jax.default_backend() == "tpu"
    cfg = VAEConfig(
        num_param=args.samples, num_time=args.time, num_node=args.nodes,
        latent_dim_end=32, latent_dim=8,
        num_filter_enc=[1024, 512, 256, 128], small=True, n_epochs=100,
        batch_size=args.batch, lr=1e-3, alpha=1e6,
        dtype="bfloat16" if on_tpu else "float32",
    )
    trainer = VAETrainer(cfg, donate=True, fast_rng=on_tpu)

    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.standard_normal((args.samples, args.time, args.nodes))
        .astype(np.float32) * 0.3, jnp.dtype(cfg.dtype))

    state = trainer.init_state(jax.random.PRNGKey(0))
    state, m = trainer._train_epoch(state, data, jax.random.PRNGKey(1))
    _ = float(m["loss"])  # warmup + compile, synced

    steps = args.epochs * (args.samples // args.batch)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for i in range(args.epochs):
            state, m = trainer._train_epoch(state, data,
                                            jax.random.PRNGKey(2 + i))
        _ = float(m["loss"])
    wall = time.perf_counter() - t0
    print(f"traced {steps} steps, wall {wall*1e3:.1f} ms "
          f"({wall*1e3/steps:.1f} ms/step incl. one sync) -> {args.out}")


if __name__ == "__main__":
    main()
