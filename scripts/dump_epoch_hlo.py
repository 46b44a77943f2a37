#!/usr/bin/env python
"""Dump the optimized HLO of the bench-configured train epoch.

Companion to trace_epoch.py / trace_summary.py: the trace gives fusion
*names* (fusion.5058, multiply_subtract_fusion.315, ...); this dump gives
their op_name metadata so each hot fusion maps back to a source line.

    python scripts/dump_epoch_hlo.py --out /tmp/epoch_hlo.txt
    python scripts/trace_summary.py hlo /tmp/epoch_hlo.txt --min-mb 32
    grep -A3 'fusion.5058 =' /tmp/epoch_hlo.txt
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/epoch_hlo.txt")
    ap.add_argument("--nodes", type=int, default=95008)
    ap.add_argument("--time", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--samples", type=int, default=64)
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

    lowered = jax.jit(trainer._train_epoch_impl,
                      donate_argnums=(0,)).lower(
        state, data, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB HLO -> {args.out}")


if __name__ == "__main__":
    main()
