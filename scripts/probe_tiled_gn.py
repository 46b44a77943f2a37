#!/usr/bin/env python
"""Hardware probe for the two-phase tiled GroupNorm kernel (Mosaic lowering
cannot be validated in interpret mode).  Runs parity + grad-parity + timing
on the real TPU at the geometries that matter: the 5120-wide decoder maps
and the 95008-channel flagship readout (11876-wide groups, non-128-divisible
C)."""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simulgen_vae_tpu.ops import groupnorm_gelu as gg  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def probe(b, t, c, g, act, dtype, check_grad=True, time_it=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32),
                    dtype)
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    ref_f = jax.jit(lambda a: gg.group_norm_gelu_reference(a, scale, bias, g,
                                                           act=act))
    til_f = jax.jit(lambda a: gg.tiled_group_norm_gelu(a, scale, bias, g,
                                                       1e-5, act))
    ref = ref_f(x)
    out = til_f(x)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"[{b}x{t}x{c} g={g} {act} {dtype}] fwd max|err|={err:.2e}")
    assert err < (5e-2 if dtype == "bfloat16" else 1e-4), "fwd mismatch"

    if check_grad:
        gref = jax.jit(jax.grad(lambda a: jnp.sum(
            gg.group_norm_gelu_reference(a, scale, bias, g, act=act)
            .astype(jnp.float32) ** 2)))
        gtil = jax.jit(jax.grad(lambda a: jnp.sum(
            gg.tiled_group_norm_gelu(a, scale, bias, g, 1e-5, act)
            .astype(jnp.float32) ** 2)))
        ga, gb = gref(x), gtil(x)
        gerr = float(jnp.max(jnp.abs(ga.astype(jnp.float32)
                                     - gb.astype(jnp.float32))))
        rel = gerr / (float(jnp.max(jnp.abs(ga.astype(jnp.float32)))) + 1e-9)
        print(f"  grad max|err|={gerr:.2e} rel={rel:.2e}")
        assert rel < (6e-2 if dtype == "bfloat16" else 1e-3), "grad mismatch"

    if time_it:
        for name, f in (("xla", ref_f), ("tiled", til_f)):
            sync(f(x))
            t0 = time.perf_counter()
            for _ in range(8):
                r = f(x)
            sync(r)
            dt = (time.perf_counter() - t0) / 8 * 1e3
            print(f"  {name:6s} fwd {dt:7.3f} ms")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    probe(4, 200, 5120, 8, "gelu", "bfloat16")
    probe(2, 200, 95008, 8, "tanh", "bfloat16")
    probe(2, 50, 2969 * 4, 4, "tanh", "float32")
    print("tiled GN probe: ALL OK")
