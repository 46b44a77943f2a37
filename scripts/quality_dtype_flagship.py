#!/usr/bin/env python
"""Flagship-geometry quality sweep over named numerics "arms".

Round 2 measured bf16 costing +9% train recon-MSE at small scale
(16x50x2048); round 3 showed the penalty washing out at medium scale
(32x100x4096, h2h ratio 1.006 — docs/PARITY.md) and at flagship geometry
(waves 0.9333).  Round 4 (VERDICT r3 item 3) generalizes the script from
a dtype pair to arbitrary arms so ONE run can compare the COMBINED bench
stack (bf16 compute + bf16-SR moments + per-epoch SN + fused aug, exactly
what bench.py measures) against reference-equivalent numerics (f32 +
per-step SN), and so a high-steps-per-epoch geometry can probe per-epoch
SN sigma staleness at a realistic duty cycle (>=25 steps/epoch vs the
4-step bench epoch that hides it).

Arms syntax: --arms name=dtype/opt_state_dtype/sn_cadence[,name=...]
    e.g. --arms bench=bfloat16/bfloat16/epoch,ref=float32/float32/step
The headline ratio is arm[0] final recon-MSE / arm[1].

Usage:
    python scripts/quality_dtype_flagship.py [--epochs 600] [--samples 64]
        [--nodes 95008] [--time 200] [--batch 16] [--arms ...] [--out ...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(kind: str, samples: int, num_time: int, num_node: int):
    """f32 master ensemble shared by all arms.

    "waves": the structured traveling-wave ensemble (data/dataset.py) a
    small latent space genuinely explains — recon MSE keeps improving with
    training, so a numerics gap shows.  "iid": scaled white noise
    (structure-free; recon plateaus near the posterior mean — only detects
    gross numerical degradation).
    """
    if kind == "waves":
        from simulgen_vae_tpu.data.dataset import synthetic_dataset
        from simulgen_vae_tpu.data.scaler import data_scaler

        raw = synthetic_dataset(samples, num_time, num_node, seed=7)
        scaled, _, _ = data_scaler(raw, num_time, num_node, save_path=None)
        return scaled
    rng = np.random.default_rng(7)
    return (rng.standard_normal((samples, num_time, num_node))
            .astype(np.float32) * 0.3)


def run(arm: dict, epochs: int, samples: int, log_every: int,
        base: np.ndarray, num_time: int, num_node: int, batch: int,
        filters, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    dtype = arm["dtype"]
    cfg = VAEConfig(
        num_param=samples, num_time=num_time, num_node=num_node,
        latent_dim_end=32, latent_dim=8,
        num_filter_enc=list(filters), small=True,
        n_epochs=epochs, batch_size=batch, lr=1e-3, alpha=1e6,
        dtype=dtype,
        opt_state_dtype=arm["opt_state_dtype"],
        sn_cadence=arm["sn_cadence"],
    )
    trainer = VAETrainer(cfg, donate=True, fast_rng=True)
    data = jnp.asarray(base, jnp.dtype(dtype))

    from simulgen_vae_tpu.config import resolve_perf_stack

    stack = resolve_perf_stack(cfg)
    name = arm["name"]
    print(f"[{name}] resolved perf stack: {stack}", flush=True)

    key = jax.random.PRNGKey(seed)
    state = trainer.init_state(key)
    t0 = time.time()
    compile_wall = None
    curve = []
    for epoch in range(epochs):
        key, k = jax.random.split(key)
        state, metrics = trainer._train_epoch(state, data, k)
        if epoch == 0:
            # first epoch includes the XLA compile; exclude it from wall_s
            # (ADVICE r3: bf16/f32 wall comparison here is NOT a throughput
            # statement — bench.py is)
            _ = float(metrics["loss"])
            compile_wall = time.time() - t0
            t0 = time.time()
        if epoch % log_every == 0 or epoch == epochs - 1:
            m = {k2: float(v) for k2, v in metrics.items()}
            curve.append({"epoch": epoch,
                          "recon_mse": m["recon_mse"] / cfg.alpha,
                          "kl": m["kl"]})
            print(f"[{name}] epoch {epoch}: recon_mse="
                  f"{curve[-1]['recon_mse']:.6f} kl={m['kl']:.1f}",
                  flush=True)
    wall = time.time() - t0
    final = curve[-1]
    tail = [c["recon_mse"] for c in curve if c["epoch"] >= epochs * 2 // 3]
    return {
        "arm": arm,
        "dtype": dtype,
        "perf_stack": stack,
        "epochs": epochs,
        "final_train_recon_mse": final["recon_mse"],
        "tail_mean_recon_mse": float(np.mean(tail)),
        "final_kl": final["kl"],
        # training objective at end-of-warmup weighting (alpha*recon +
        # beta*kl, beta=1) — the comparable ELBO figure (ADVICE r3)
        "neg_elbo_train_weighted": cfg.alpha * final["recon_mse"]
        + final["kl"],
        "wall_s_post_compile": round(wall, 1),
        "first_epoch_incl_compile_s": round(compile_wall, 1),
        "curve": curve,
    }


def parse_arms(spec: str):
    arms = []
    for part in spec.split(","):
        name, _, conf = part.partition("=")
        dtype, osd, cadence = conf.split("/")
        arms.append({"name": name, "dtype": dtype, "opt_state_dtype": osd,
                     "sn_cadence": cadence})
    return arms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--nodes", type=int, default=95008)
    ap.add_argument("--time", type=int, default=200, dest="num_time")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--filters", default="1024,512,256,128")
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--out",
                    default="docs/artifacts/quality_dtype_flagship.json")
    ap.add_argument("--arms",
                    default="bfloat16=bfloat16/auto/auto,"
                            "float32=float32/auto/auto",
                    help="name=dtype/opt_state_dtype/sn_cadence[,...]; "
                         "headline ratio = arm0/arm1 final recon-MSE")
    ap.add_argument("--data", default="waves", choices=("waves", "iid"))
    ap.add_argument("--seed", type=int, default=0,
                    help="init/train PRNG seed (both arms stay paired: "
                         "same seed, same data)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    filters = [int(f) for f in args.filters.split(",")]
    arms = parse_arms(args.arms)
    base = make_data(args.data, args.samples, args.num_time, args.nodes)
    results = {}
    for arm in arms:
        results[arm["name"]] = run(arm, args.epochs, args.samples,
                                   args.log_every, base, args.num_time,
                                   args.nodes, args.batch, filters,
                                   seed=args.seed)

    ratio = tail_ratio = None
    if len(arms) >= 2:
        a0, a1 = results[arms[0]["name"]], results[arms[1]["name"]]
        ratio = round(a0["final_train_recon_mse"]
                      / max(a1["final_train_recon_mse"], 1e-30), 4)
        tail_ratio = round(a0["tail_mean_recon_mse"]
                           / max(a1["tail_mean_recon_mse"], 1e-30), 4)
    out = {
        "seed": args.seed,
        "geometry": f"{args.samples}x{args.num_time}x{args.nodes} synthetic "
                    f"({args.data}), filters {args.filters}, "
                    f"batch {args.batch} "
                    f"({args.samples // args.batch} steps/epoch)",
        "arm0_over_arm1_recon_mse_ratio": ratio,
        "arm0_over_arm1_tail_mean_ratio": tail_ratio,
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
