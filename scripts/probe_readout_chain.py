#!/usr/bin/env python
"""Hardware probe + timing for the fused readout-chain op at flagship scale.

Compares the Pallas train path (matmul+GN+tanh+loss, ops/readout_chain.py)
against the XLA composition: forward value/grad parity, then fwd and
fwd+bwd timings."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from simulgen_vae_tpu.ops.readout_chain import (  # noqa: E402
    bwd_flavor,
    readout_chain_loss,
    readout_chain_loss_reference,
)


def probe(b, t, f, c, g, dtype="bfloat16", lossfun="MSE"):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32) * 0.3,
                    dtype)
    kernel = jnp.asarray(
        rng.standard_normal((f, c)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    scale = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    nb = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32) * 0.5,
                    dtype)
    inv = jnp.asarray(0.9, jnp.float32)

    # x_target rides as a jit ARGUMENT: as a closure constant it is inlined
    # into the StableHLO payload (608 MB at flagship), which the round-5
    # remote-compile tunnel rejects with HTTP 413.
    def run(fn):
        def loss(k_, h_, x_):
            l, m = fn(h_, k_, bias, scale, nb, x_, inv, g, 1e-5, lossfun)
            return l + 0.1 * m
        return loss

    fused = run(readout_chain_loss)
    ref = run(readout_chain_loss_reference)

    f_fwd = jax.jit(fused)
    r_fwd = jax.jit(ref)
    f_g = jax.jit(jax.value_and_grad(fused, argnums=(0, 1)))
    r_g = jax.jit(jax.value_and_grad(ref, argnums=(0, 1)))

    la, lb = float(f_fwd(kernel, h, x)), float(r_fwd(kernel, h, x))
    rel = abs(la - lb) / (abs(lb) + 1e-12)
    print(f"[{b}x{t}x{f}->{c} g={g} {lossfun}] fwd rel err {rel:.2e} "
          f"({la:.6f} vs {lb:.6f}); default bwd -> {bwd_flavor(b, t, f, c)}")
    assert rel < 2e-2

    (va, (gka, gha)) = f_g(kernel, h, x)
    (vb, (gkb, ghb)) = r_g(kernel, h, x)
    for name, a_, b_ in (("dW", gka, gkb), ("dh", gha, ghb)):
        aa = np.asarray(a_, np.float32)
        bb = np.asarray(b_, np.float32)
        relg = np.max(np.abs(aa - bb)) / (np.max(np.abs(bb)) + 1e-12)
        print(f"  {name} rel err {relg:.2e}")
        assert relg < 5e-2, name

    # second fused grad fn with the OTHER backward flavor (round 5:
    # 'fused' contracts dW/dh in-kernel, 'materialize' writes dy and
    # leaves them to XLA einsums — ops/readout_chain._bwd_mode)
    other = ("materialize"
             if os.environ.get("SIMULGEN_READOUT_BWD", "fused") == "fused"
             else "fused")
    os.environ["SIMULGEN_READOUT_BWD"] = other
    f_g2 = jax.jit(jax.value_and_grad(fused, argnums=(0, 1)))
    (vc, (gkc, ghc)) = f_g2(kernel, h, x)
    for name, a_, b_ in (("dW", gkc, gkb), ("dh", ghc, ghb)):
        aa = np.asarray(a_, np.float32)
        bb = np.asarray(b_, np.float32)
        relg = np.max(np.abs(aa - bb)) / (np.max(np.abs(bb)) + 1e-12)
        print(f"  {name} ({other} bwd) rel err {relg:.2e}")
        assert relg < 5e-2, name
    os.environ.pop("SIMULGEN_READOUT_BWD", None)

    for name, fn, args in (("xla fwd", r_fwd, (kernel, h, x)),
                           ("fused fwd", f_fwd, (kernel, h, x)),
                           ("xla fwd+bwd", r_g, (kernel, h, x)),
                           ("fused fwd+bwd", f_g, (kernel, h, x)),
                           (f"fused fwd+{other} bwd", f_g2, (kernel, h, x))):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].sum()
                  if hasattr(jax.tree.leaves(out)[0], "sum")
                  else jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        n = 6
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[-1]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"  {name:14s} {dt:8.3f} ms")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    probe(16, 200, 1024, 95008, 8)          # flagship readout chain
    probe(4, 200, 1024, 95008, 8)           # flagship width, fused-bwd-feasible batch
    probe(4, 200, 128, 5120, 8, lossfun="Huber")
    print("readout chain probe: ALL OK")
