#!/usr/bin/env python
"""Time the flagship model's constituent ops on TPU to locate bottlenecks.

Host-readback sync (block_until_ready is unreliable on proxied backends).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    B, T, N = 16, 200, 95008
    F0 = 1024
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def timed(name, fn, *args, n=8):
        f = jax.jit(fn)
        out = f(*args)
        _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])  # sync compile
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        _ = np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
        dt = (time.perf_counter() - t0) / n
        print(f"{name:42s}: {dt * 1e3:8.2f} ms")
        return dt

    x = jnp.asarray(rng.standard_normal((B, T, N)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    w_emb = jnp.asarray(rng.standard_normal((N, F0)).astype(np.float32) * 0.01,
                        jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((128, N)).astype(np.float32) * 0.01,
                        jnp.bfloat16)
    h128 = jnp.asarray(rng.standard_normal((B, T, 128)).astype(np.float32),
                       jnp.bfloat16)
    h1024 = jnp.asarray(rng.standard_normal((B, T, F0)).astype(np.float32),
                        jnp.bfloat16)
    scale = jnp.ones(N, jnp.float32)
    bias = jnp.zeros(N, jnp.float32)

    timed("embed matmul [BT,95008]x[95008,1024]",
          lambda a, w: jnp.einsum("btn,nf->btf", a, w,
                                  preferred_element_type=jnp.float32), x, w_emb)
    timed("readout matmul [BT,128]x[128,95008]",
          lambda a, w: jnp.einsum("btf,fn->btn", a, w,
                                  preferred_element_type=jnp.float32),
          h128, w_out)

    from simulgen_vae_tpu.ops.groupnorm_gelu import group_norm_gelu_reference

    timed("recon GroupNorm(8)+tanh on [16,200,95008]",
          lambda a, s, b: group_norm_gelu_reference(a, s, b, 8, act="tanh"),
          x, scale, bias)
    timed("mse f32 on [16,200,95008]",
          lambda a, b: jnp.mean((a.astype(jnp.float32)
                                 - b.astype(jnp.float32)) ** 2), x, x)

    from simulgen_vae_tpu.models.blocks import DecoderResidualBlock

    blk = DecoderResidualBlock(F0, small=True, dtype=jnp.bfloat16)
    p = blk.init(key, h1024)
    timed("DecoderResidualBlock(1024, 5x, k=5)",
          lambda v, a: blk.apply(v, a), p, h1024)

    from simulgen_vae_tpu.data.augmentation import augment_batch

    part = x[::-1]
    timed("augment_batch on [16,200,95008]",
          lambda k, a, b: augment_batch(k, a, b), key, x, part)

    # Full encoder / decoder
    from simulgen_vae_tpu.models.encoder import Encoder
    from simulgen_vae_tpu.models.decoder import Decoder

    enc = Encoder(32, 8, [1024, 512, 256, 128], T, True, jnp.bfloat16)
    pe = enc.init(key, x)
    timed("full encoder", lambda v, a: enc.apply(v, a), pe, x)

    dec = Decoder(32, 8, [128, 256, 512, 1024], N, T, True, jnp.bfloat16)
    z = jnp.zeros((B, 32), jnp.bfloat16)
    xs = [jnp.zeros((B, 8), jnp.bfloat16) for _ in range(2)]
    pd = dec.init({"params": key, "sample": key}, z, xs)
    timed("full decoder",
          lambda v, zz: dec.apply(v, zz, xs, rngs={"sample": key})[0], pd, z)

    # Spectral norm + optimizer on a flagship-sized param set
    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    cfg = VAEConfig(num_param=32, num_time=T, num_node=N,
                    num_filter_enc=[1024, 512, 256, 128], small=True,
                    batch_size=B, dtype="bfloat16", alpha=1e6)
    trainer = VAETrainer(cfg, donate=False)
    state = trainer.init_state(key)

    from simulgen_vae_tpu.models.spectral_norm import (
        compute_sigmas,
        spectral_normalize,
    )

    timed("spectral_normalize (full params, materializing)",
          lambda pp, uu: spectral_normalize(pp, uu,
                                            compute_dtype=jnp.bfloat16)[0],
          state.params, state.sn_u, n=4)
    timed("compute_sigmas (full params, output-scaling SN)",
          lambda pp, uu: compute_sigmas(pp, uu,
                                        compute_dtype=jnp.bfloat16)[0],
          state.params, state.sn_u, n=4)

    grads = jax.tree.map(jnp.ones_like, state.params)

    timed("fused adamw update (full params)",
          lambda g, os_, pp: trainer.opt.apply(g, os_, pp, 1e-3)[0],
          grads, state.opt_state, state.params, n=4)


if __name__ == "__main__":
    main()
