#!/usr/bin/env python
"""Full-dataset streaming benchmark: the reference's documented flagship
workload (484 params x 200 timesteps x 95008 nodes, README.md:128-134 /
input_data/condition.txt) trained from HOST memory on one chip — the
dataset (36 GB f32) does not fit in the 16 GB HBM, so this exercises
``VAETrainer.train_epoch_streaming`` (the reference's ``load_all=0`` path,
modules/utils.py:38-76).

Reports, separately, the pieces that bound the pipeline:
  * raw H2D bandwidth of a batch-sized block through this container's link
  * native C++ gather throughput (host-side row assembly + bf16 downcast)
  * resident-batch compute step time (no H2D)
  * measured streaming samples/sec for N steps, both partner modes

Usage:
  python scripts/bench_streaming.py [--samples 484] [--steps 6]
                                    [--partner dataset|batch|both]
                                    [--full-epoch]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_host_array(n, t, c):
    """36 GB synthetic host array, block-filled to bound generation time."""
    data = np.empty((n, t, c), np.float32)
    rng = np.random.default_rng(0)
    block = rng.standard_normal((1, t, c)).astype(np.float32) * 0.3
    for i in range(n):
        # cheap per-row variation: scaled/rolled copies of the base block
        data[i] = block[0] * (0.8 + 0.4 * (i % 7) / 6.0)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=484)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--partner", default="both",
                    choices=["dataset", "batch", "both"])
    ap.add_argument("--full-epoch", action="store_true",
                    help="run one COMPLETE epoch over all samples")
    ap.add_argument("--nodes", type=int, default=95008)
    ap.add_argument("--time", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.data import native_loader
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    n, t, c = args.samples, args.time, args.nodes
    print(f"building {n}x{t}x{c} host array "
          f"({n * t * c * 4 / 1e9:.1f} GB f32)...", flush=True)
    t0 = time.perf_counter()
    data = build_host_array(n, t, c)
    print(f"  built in {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = VAEConfig(num_param=n, num_time=t, num_node=c,
                    latent_dim_end=32, latent_dim=8,
                    num_filter_enc=[1024, 512, 256, 128], small=True,
                    n_epochs=100, batch_size=16, lr=1e-3, alpha=1e6,
                    dtype="bfloat16")
    trainer = VAETrainer(cfg, donate=True, fast_rng=True)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    bsz = cfg.batch_size
    results = {}

    # -- native gather throughput (host only) ------------------------------
    idx = np.random.default_rng(1).integers(0, n, size=bsz)
    out = native_loader.gather_rows(data, idx, to_bf16=True)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        out = native_loader.gather_rows(data, idx, to_bf16=True)
    dt = (time.perf_counter() - t0) / 3
    gbps = out.nbytes / dt / 1e9
    results["native_gather_GBps"] = round(gbps, 2)
    print(f"native gather: {dt * 1e3:.0f} ms/batch = {gbps:.2f} GB/s out",
          flush=True)

    # -- raw H2D bandwidth -------------------------------------------------
    dev = jax.device_put(out)
    _ = float(jnp.asarray(dev).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    dev = jax.device_put(out)
    _ = float(jnp.asarray(dev).ravel()[0].astype(jnp.float32))
    dt = time.perf_counter() - t0
    results["h2d_MBps"] = round(out.nbytes / dt / 1e6, 1)
    print(f"H2D {out.nbytes / 1e6:.0f} MB batch: {dt:.2f}s = "
          f"{out.nbytes / dt / 1e6:.0f} MB/s", flush=True)

    # -- resident compute step (no H2D) ------------------------------------
    # _train_step donates its state arg: time a COPY so the pristine state
    # survives for the streaming runs below.
    st = jax.tree.map(jnp.copy, state)
    batch = jax.device_put(out)
    partner = jnp.roll(batch, 1, axis=0)
    st, m = trainer._train_step(st, batch, partner, jax.random.PRNGKey(2))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(3):
        st, m = trainer._train_step(st, batch, partner,
                                    jax.random.PRNGKey(3 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 3
    results["resident_step_ms"] = round(dt * 1e3, 1)
    results["resident_sps"] = round(bsz / dt, 1)
    print(f"resident-batch step: {dt * 1e3:.1f} ms = {bsz / dt:.1f} "
          "samples/s", flush=True)
    del batch, partner, st

    # -- streaming ---------------------------------------------------------
    modes = (["dataset", "batch"] if args.partner == "both"
             else [args.partner])
    steps = None if args.full_epoch else args.steps
    del state  # HBM: keep at most one 4.7 GB train state alive at a time
    for mode in modes:
        st_in = trainer.init_state(jax.random.PRNGKey(11))
        t0 = time.perf_counter()
        state2, m = trainer.train_epoch_streaming(
            st_in, data, jax.random.PRNGKey(7), partner_mode=mode,
            max_steps=steps,
        )
        dt = time.perf_counter() - t0
        n_steps = steps or (n // bsz)
        sps = n_steps * bsz / dt
        results[f"stream_{mode}_sps"] = round(sps, 3)
        results[f"stream_{mode}_s_per_step"] = round(dt / n_steps, 2)
        print(f"streaming partner={mode}: {n_steps} steps in {dt:.1f}s = "
              f"{sps:.2f} samples/s (loss {m['loss']:.3e})", flush=True)
        del st_in, state2

    results["config"] = {"samples": n, "time": t, "nodes": c,
                         "batch": bsz, "steps": steps or n // bsz,
                         "full_epoch": bool(args.full_epoch)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
