#!/usr/bin/env python
"""Isolate FusedAdamW's cost vs SR mode at flagship parameter count.

The full-bench delta (RTN bf16 m+v 238.3 vs SR bf16 m+v 224.6 samples/s
= +4.1 ms/step) pointed at the SR noise path.  This probe times ONLY the
optimizer sweep on a flagship-sized tree so noise-generation variants can
be compared without a 15-minute flagship compile per experiment.

    python scripts/probe_opt_sr.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simulgen_vae_tpu.train.optim import FusedAdamW


def tree_like_flagship(key):
    """A handful of leaves matching the flagship VAE's scale (~310M params:
    a few huge decoder kernels + many small ones)."""
    shapes = [
        (5, 5120, 5120),   # dec_res_2-like       131M
        (5, 5120, 5120),   #                      131M
        (1024, 95008 // 2),  # readout-like        48M (bf16-friendly)
        (5, 1024, 1024),
        (5, 512, 512),
        (256, 256),
    ]
    ks = jax.random.split(key, len(shapes))
    return {f"w{i}": jax.random.normal(k, s, jnp.float32) * 0.02
            for i, (k, s) in enumerate(zip(ks, shapes))}


def time_apply(opt, params, grads, iters=30):
    state = opt.init(params)
    lr = jnp.float32(1e-3)

    @jax.jit
    def step(g, s, p):
        return opt.apply(g, s, p, lr)

    p, s, _ = step(grads, state, params)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, _ = step(grads, s, p)
    # sync via scalar readback (proxied backend)
    _ = float(jax.tree.leaves(p)[0][0, 0, 0]) if jax.tree.leaves(p)[0].ndim == 3 \
        else float(jax.tree.leaves(p)[0][0, 0])
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    key = jax.random.PRNGKey(0)
    params = tree_like_flagship(key)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f}M  backend={jax.default_backend()}")
    grads = jax.tree.map(lambda x: x * 1e-3, params)

    cfgs = [
        ("f32 m+v", dict()),
        ("bf16 m, f32 v (RTN)", dict(moment_dtype=jnp.bfloat16,
                                     nu_dtype=jnp.float32)),
        ("bf16 m+v (RTN)", dict(moment_dtype=jnp.bfloat16)),
        ("bf16 m+v (fused hash SR)", dict(moment_dtype=jnp.bfloat16,
                                          stochastic_round=True)),
    ]
    for name, kw in cfgs:
        ms = time_apply(FusedAdamW(**kw), params, grads)
        gb = n * 4 * 4 / 1e9  # rough f32 r/w bound
        print(f"{name:26s} {ms:8.2f} ms   (~{gb/ms*1e3:5.0f} GB/s vs naive f32 bound)")


if __name__ == "__main__":
    main()
