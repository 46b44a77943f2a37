#!/usr/bin/env python
"""Flagship-geometry bf16-vs-f32 quality sweep (closes the last open
dtype-quality checkbox, docs/ROADMAP.md "Quality").

Round 2 measured bf16 costing +9% train recon-MSE at small scale
(16x50x2048); round 3 showed the penalty washing out at medium scale
(32x100x4096, h2h ratio 1.006 — docs/PARITY.md).  This script runs the
remaining point: the REAL benched geometry — 200 timesteps x 95008 nodes,
encoder filters 1024/512/256/128 (the reference's documented workload,
preset.txt) — with a synthetic ensemble standing in for the 484-sample
dataset (no real data ships in this environment).  Both dtypes train the
same schedule from the same init seed; we compare final train recon-MSE
(and a beta=1 neg-ELBO proxy).

Usage:
    python scripts/quality_dtype_flagship.py [--epochs 600] [--samples 64]
                                             [--out docs/artifacts/...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(kind: str, samples: int):
    """f32 master ensemble shared by both dtype legs.

    "waves": the structured traveling-wave ensemble (data/dataset.py) a
    small latent space genuinely explains — recon MSE keeps improving with
    training, so a dtype gap shows.  "iid": scaled white noise (structure-
    free; recon plateaus near the posterior mean — only detects gross
    numerical degradation).
    """
    if kind == "waves":
        from simulgen_vae_tpu.data.dataset import synthetic_dataset
        from simulgen_vae_tpu.data.scaler import data_scaler

        raw = synthetic_dataset(samples, 200, 95008, seed=7)
        scaled, _, _ = data_scaler(raw, 200, 95008, save_path=None)
        return scaled
    rng = np.random.default_rng(7)
    return rng.standard_normal((samples, 200, 95008)).astype(np.float32) * 0.3


def run(dtype: str, epochs: int, samples: int, log_every: int,
        base: np.ndarray):
    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    cfg = VAEConfig(
        num_param=samples, num_time=200, num_node=95008,
        latent_dim_end=32, latent_dim=8,
        num_filter_enc=[1024, 512, 256, 128], small=True,
        n_epochs=epochs, batch_size=16, lr=1e-3, alpha=1e6,
        dtype=dtype,
    )
    trainer = VAETrainer(cfg, donate=True, fast_rng=True)
    data = jnp.asarray(base, jnp.dtype(dtype))

    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    t0 = time.time()
    curve = []
    for epoch in range(epochs):
        key, k = jax.random.split(key)
        state, metrics = trainer._train_epoch(state, data, k)
        if epoch % log_every == 0 or epoch == epochs - 1:
            m = {k2: float(v) for k2, v in metrics.items()}
            curve.append({"epoch": epoch,
                          "recon_mse": m["recon_mse"] / cfg.alpha,
                          "kl": m["kl"]})
            print(f"[{dtype}] epoch {epoch}: recon_mse="
                  f"{curve[-1]['recon_mse']:.6f} kl={m['kl']:.1f}",
                  flush=True)
    wall = time.time() - t0
    final = curve[-1]
    return {
        "dtype": dtype,
        "epochs": epochs,
        "final_train_recon_mse": final["recon_mse"],
        "final_kl": final["kl"],
        "neg_elbo_proxy": final["recon_mse"] + final["kl"],
        "wall_s": round(wall, 1),
        "curve": curve,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--out",
                    default="docs/artifacts/quality_dtype_flagship.json")
    ap.add_argument("--dtypes", default="bfloat16,float32",
                    help="comma list; run one dtype (e.g. a f32 retry at "
                         "fewer --samples after an OOM) and merge by hand")
    ap.add_argument("--data", default="waves", choices=("waves", "iid"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    base = make_data(args.data, args.samples)
    results = {}
    for dtype in args.dtypes.split(","):
        results[dtype] = run(dtype, args.epochs, args.samples,
                             args.log_every, base)

    ratio = None
    if "bfloat16" in results and "float32" in results:
        ratio = round(
            results["bfloat16"]["final_train_recon_mse"]
            / max(results["float32"]["final_train_recon_mse"], 1e-30), 4)
    out = {
        "geometry": f"{args.samples}x200x95008 synthetic ({args.data}), "
                    "filters 1024/512/256/128",
        "bf16_over_f32_recon_mse_ratio": ratio,
        "results": {k: {k2: v2 for k2, v2 in v.items() if k2 != "curve"}
                    for k, v in results.items()},
        "curves": {k: v["curve"] for k, v in results.items()},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "curves"},
                     indent=1))


if __name__ == "__main__":
    main()
