#!/usr/bin/env python
"""Profile the flagship VAE train step: per-phase timings + optional trace.

Usage:
    python scripts/profile_vae.py [--trace /tmp/jax-trace] [--pallas 0|1]
                                  [--nodes 95008] [--time 200] [--batch 16]

Phases timed separately (sync via host readback — block_until_ready is not
reliable on proxied backends):
  * forward only
  * forward+backward (grads)
  * full train step (aug + SN + grads + AdamW)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, sync, n=5):
    fn()  # warmup/compile
    sync()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    sync()
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--pallas", default=None)
    ap.add_argument("--nodes", type=int, default=95008)
    ap.add_argument("--time", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--filters", default="1024,512,256,128")
    ap.add_argument("--no_sn", action="store_true",
                    help="disable spectral norm to quantify its step cost")
    args = ap.parse_args()

    if args.pallas is not None:
        os.environ["SIMULGEN_PALLAS"] = args.pallas

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    filters = list(map(int, args.filters.split(",")))
    cfg = VAEConfig(num_param=2 * args.batch, num_time=args.time,
                    num_node=args.nodes, latent_dim_end=32, latent_dim=8,
                    num_filter_enc=filters, small=True, n_epochs=100,
                    batch_size=args.batch, lr=1e-3, alpha=1e6,
                    dtype="bfloat16")
    trainer = VAETrainer(cfg, donate=False, use_spectral_norm=not args.no_sn)
    model = trainer.model

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.standard_normal((args.batch, args.time, args.nodes))
        .astype(np.float32) * 0.3, jnp.bfloat16)
    partner = batch[::-1]

    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    holder = {}

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           rngs={"sample": key})[1])

    def loss_only(p, x):
        from simulgen_vae_tpu.models.spectral_norm import compute_sigmas

        sig, _ = compute_sigmas(p, state.sn_u, update=False,
                                compute_dtype=trainer._sn_compute_dtype())
        loss, _ = trainer._loss_fn(p, sig, x, key, 1.0)
        return loss

    grad = jax.jit(jax.grad(loss_only))

    def sync():
        if "v" in holder:
            v = holder["v"]
            leaf = jax.tree.leaves(v)[0]
            _ = np.asarray(jax.numpy.ravel(leaf)[0])

    def run_fwd():
        holder["v"] = fwd(state.params, batch)

    def run_grad():
        holder["v"] = grad(state.params, batch)

    def run_step():
        s, m = trainer._train_step(state, batch, partner,
                                   jax.random.PRNGKey(3))
        holder["v"] = m["loss"]

    t_fwd = timed(run_fwd, sync)
    t_grad = timed(run_grad, sync)
    t_step = timed(run_step, sync)
    print(f"pallas={os.environ.get('SIMULGEN_PALLAS', 'auto')} sn={not args.no_sn} "
          f"nodes={args.nodes} T={args.time} B={args.batch}")
    print(f"forward            : {t_fwd * 1e3:8.2f} ms")
    print(f"forward+backward   : {t_grad * 1e3:8.2f} ms")
    print(f"full train step    : {t_step * 1e3:8.2f} ms  "
          f"({args.batch / t_step:.1f} samples/s)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            run_step()
            sync()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
