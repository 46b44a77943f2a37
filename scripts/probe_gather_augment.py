#!/usr/bin/env python
"""Hardware probe for the fused gather+augment kernel (ops/gather_augment.py).

Measures, at flagship bench geometry (64x200x95008 bf16 resident set,
batch 16), with chained dispatch and one scalar-readback sync per timing
block (the only reliable sync on this tunneled backend):

  copy      : elementwise copy of one batch worth of rows (BW ceiling probe)
  xla-chain : jnp.take(batch) + jnp.take(partner) + augment_batch (current)
  fused     : gather_augment kernel (one pass, in-register noise)

plus a correctness check (noise off: fused == jnp oracle; noise on:
moment test on (out-x)/sd) and the end-to-end verdict: bench-style timed
epochs with SIMULGEN_FUSED_AUG off/on.
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

from simulgen_vae_tpu.ops.gather_augment import (  # noqa: E402
    gather_augment,
    gather_augment_reference,
)


def timed(fn, args, reps=30, sync=lambda out: float(jnp.sum(
        out[0, 0, :8].astype(jnp.float32)))):
    out = fn(*args)
    _ = sync(out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = sync(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        n, t, nodes, b = 64, 200, 95008, 16
        dtype = jnp.bfloat16
    else:
        n, t, nodes, b = 16, 50, 2048, 8
        dtype = jnp.float32

    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.standard_normal((n, t, nodes)).astype(np.float32) * 0.3, dtype)
    idx = jnp.asarray(rng.integers(0, n, b), jnp.int32)
    pidx = jnp.asarray(rng.integers(0, n, b), jnp.int32)
    lam = jnp.asarray(np.clip(rng.beta(0.2, 0.2, b), 0.1, 0.9), jnp.float32)
    lam = jnp.where(jnp.arange(b) % 2 == 0, lam, 1.0)
    amp = jnp.asarray(rng.uniform(0.9, 1.1, b), jnp.float32)
    sd = jnp.where(jnp.arange(b) % 3 == 0, 0.05, 0.0).astype(jnp.float32)

    batch_bytes = b * t * nodes * data.dtype.itemsize

    # -- correctness on hardware -----------------------------------------
    sd0 = jnp.zeros((b,), jnp.float32)
    out0 = gather_augment(data, idx, pidx, 5, lam, amp, sd0,
                          with_noise=False)
    ref0 = gather_augment_reference(data, idx, pidx,
                                    jnp.zeros(out0.shape, jnp.float32),
                                    lam, amp, sd0)
    err = float(jnp.max(jnp.abs(out0.astype(jnp.float32)
                                - ref0.astype(jnp.float32))))
    print(f"deterministic max|err| = {err:.2e}", flush=True)
    assert err < 2e-2, "fused kernel deterministic path mismatch"

    ones = jnp.ones((b,), jnp.float32)
    sd_on = jnp.full((b,), 0.05, jnp.float32)
    outn = gather_augment(data, idx, pidx, 6, ones, ones, sd_on)
    x = jnp.take(data, idx, axis=0)
    z = ((outn.astype(jnp.float32) - x.astype(jnp.float32)) / 0.05)
    zm, zs = float(jnp.mean(z)), float(jnp.std(z))
    print(f"noise moments: mean={zm:+.4f} std={zs:.4f}", flush=True)
    assert abs(zm) < 0.02 and abs(zs - 1.0) < 0.05, "in-kernel noise off"

    # -- micro timings ----------------------------------------------------
    from simulgen_vae_tpu.data.augmentation import (
        AugmentationConfig,
        augment_batch,
    )
    aug_cfg = AugmentationConfig()
    batch0 = jnp.take(data, idx, axis=0)

    copy = jax.jit(lambda v: v * jnp.asarray(1.0001, v.dtype))
    key = jax.random.key(0, impl="rbg")

    def xla_chain(data_, idx_, pidx_, key_):
        bt = jnp.take(data_, idx_, axis=0)
        pt = jnp.take(data_, pidx_, axis=0)
        return augment_batch(key_, bt, pt, aug_cfg)

    xla_chain = jax.jit(xla_chain)
    fused = jax.jit(lambda d, i_, p_, s: gather_augment(
        d, i_, p_, s, lam, amp, sd))

    t_copy = timed(copy, (batch0,))
    t_xla = timed(xla_chain, (data, idx, pidx, key))
    t_fused = timed(fused, (data, idx, pidx, jnp.int32(9)))

    if "--tiles" in sys.argv:
        # tile_n sweep: bigger tiles amortize DMA setup per grid cell but
        # eat VMEM ((1,T,tile) x 2 inputs + out, double-buffered).
        for tile in (1024, 2048, 4096, 8192, 11876):
            try:
                f = jax.jit(lambda d, i_, p_, s, _t=tile: gather_augment(
                    d, i_, p_, s, lam, amp, sd, tile_n=_t))
                ms = timed(f, (data, idx, pidx, jnp.int32(9)))
                print(f"  tile_n={tile:5d}: {ms:7.2f} ms "
                      f"({3 * batch_bytes / (ms * 1e-3) / 1e9:6.1f} GB/s)",
                      flush=True)
            except Exception as e:
                print(f"  tile_n={tile:5d}: FAIL {str(e)[:120]}", flush=True)

    def bw(ms, bytes_moved):
        return bytes_moved / (ms * 1e-3) / 1e9

    print(f"copy      : {t_copy:7.2f} ms  "
          f"({bw(t_copy, 2 * batch_bytes):6.1f} GB/s r+w)", flush=True)
    print(f"xla-chain : {t_xla:7.2f} ms  "
          f"({bw(t_xla, 3 * batch_bytes):6.1f} GB/s min-traffic)",
          flush=True)
    print(f"fused     : {t_fused:7.2f} ms  "
          f"({bw(t_fused, 3 * batch_bytes):6.1f} GB/s min-traffic)",
          flush=True)

    if not on_tpu:
        return

    # -- end-to-end: bench-style epochs off vs on -------------------------
    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    filters = [1024, 512, 256, 128]
    cfg = VAEConfig(num_param=n, num_time=t, num_node=nodes,
                    latent_dim_end=32, latent_dim=8, num_filter_enc=filters,
                    small=True, n_epochs=100, batch_size=b, lr=1e-3,
                    alpha=1e6, dtype="bfloat16")
    steps_per_epoch = n // b
    for fused_flag in (False, True):
        trainer = VAETrainer(cfg, donate=True, fast_rng=True,
                             fused_aug=fused_flag)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, m = trainer._train_epoch(state, data, jax.random.PRNGKey(1))
        _ = float(m["loss"])
        sps = []
        k = 2
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                state, m = trainer._train_epoch(state, data,
                                                jax.random.PRNGKey(k))
                k += 1
            _ = float(m["loss"])
            dt = time.perf_counter() - t0
            sps.append(3 * steps_per_epoch * b / dt)
        print(f"epoch fused_aug={int(fused_flag)}: "
              f"{[round(v, 1) for v in sps]} samples/s "
              f"(median {np.median(sps):.1f})", flush=True)
        del trainer, state


if __name__ == "__main__":
    main()
