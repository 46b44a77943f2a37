#!/usr/bin/env python
"""Quality + quantization-error probe for the int8 serving decode.

Trains a small VAE on synthetic data, extracts the train-set latents, then
decodes them twice — float vs int8 decoder (``ops/quant.py``) — and reports:

* recon MSE vs the original fields for both paths (the serving-quality
  number: does int8 change what a user gets back?),
* relative L2 between the two decoded fields (pure quantization error).

Run on CPU (default, tiny geometry) or TPU (``--platform tpu``; add
``--nodes 95008 --time 200 --filters 1024,512,256,128`` for flagship
geometry).  Results go into docs/PERF.md "Int8 serving decode".
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--params", type=int, default=16)
    ap.add_argument("--time", type=int, default=50)
    ap.add_argument("--nodes", type=int, default=2048)
    ap.add_argument("--filters", type=str, default="64,32,16,8")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.data.dataset import synthetic_dataset
    from simulgen_vae_tpu.data.scaler import data_scaler
    from simulgen_vae_tpu.evaluation.reconstruction import (
        evaluate_vae_reconstruction,
    )
    from simulgen_vae_tpu.models.vae import VAE
    from simulgen_vae_tpu.ops.quant import build_quant_collection
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    filters = [int(f) for f in args.filters.split(",")]
    cfg = VAEConfig(
        num_param=args.params, num_time=args.time, num_node=args.nodes,
        latent_dim_end=32, latent_dim=8, num_filter_enc=filters, small=True,
        n_epochs=args.epochs, batch_size=args.batch, lr=1e-3, alpha=1e6,
        dtype="bfloat16" if args.platform == "tpu" else "float32",
    )
    data = synthetic_dataset(args.params, args.time, args.nodes, seed=0)
    scaled, _, _ = data_scaler(data, args.time, args.nodes, save_path=None)
    scaled = jnp.asarray(scaled, jnp.dtype(cfg.dtype))

    trainer = VAETrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    key = jax.random.PRNGKey(1)
    for _ in range(args.epochs):
        key, k = jax.random.split(key)
        state, metrics = trainer._train_epoch(state, scaled, k)
    print(f"trained {args.epochs} epochs in {time.time() - t0:.1f}s "
          f"(final recon_mse {float(metrics['recon_mse']) / cfg.alpha:.3e})",
          flush=True)

    params = trainer.eval_params(state)
    lv, hv, _, _, _ = evaluate_vae_reconstruction(
        trainer.model, params, scaled, jax.random.PRNGKey(2),
        recon_iter=1, batch_size=args.batch, verbose=False)

    model = trainer.model
    z = jnp.asarray(lv)
    xs = [jnp.asarray(hv[:, i]) for i in range(hv.shape[1])]
    skey = jax.random.PRNGKey(0)

    def decode(extra):
        # Chunked decode: one flagship-geometry batch of activations at
        # 1024 filters is ~5 GB in f32 — the full set does not fit HBM.
        outs = []
        bsz = args.batch
        for i in range(0, z.shape[0], bsz):
            out = model.apply(
                {"params": params, **extra}, z[i:i + bsz],
                [x[i:i + bsz] for x in xs], method=VAE.generate,
                rngs={"sample": skey}).astype(jnp.float32)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=0)

    f_float = decode({})
    quant = {"decoder": build_quant_collection(
        jax.tree.map(np.asarray, params["decoder"]))}
    f_int8 = decode({"quant": quant})

    ref = np.asarray(scaled, np.float32)
    mse_float = float(np.mean((f_float - ref) ** 2))
    mse_int8 = float(np.mean((f_int8 - ref) ** 2))
    rel = float(np.linalg.norm(f_int8 - f_float) /
                max(np.linalg.norm(f_float), 1e-12))
    out = {
        "geometry": f"{args.params}x{args.time}x{args.nodes}",
        "filters": args.filters, "epochs": args.epochs,
        "platform": args.platform, "dtype": cfg.dtype,
        "recon_mse_float": mse_float, "recon_mse_int8": mse_int8,
        "mse_ratio_int8_over_float": mse_int8 / mse_float,
        "rel_l2_int8_vs_float": rel,
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
