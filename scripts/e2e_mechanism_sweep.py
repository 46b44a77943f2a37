#!/usr/bin/env python
"""E2E mechanism sweep: why did round 3's E2E head-to-head trail the
reference (ratio 1.089) with zero fixed-vs-severed gradient gap?

Round-3 diagnosis (docs/artifacts/h2h_e2e.json): the rebuild trailed the
reference EVEN IN THE SEVERED ARM (reg-only training, identical semantics to
the reference's own defect) — reg_main 0.148 vs 0.081 — so the deficit is in
the conditioner training, not the gradient fix.  The one semantic delta
found by re-reading ``latent_conditioner_e2e.py:274-295``: the reference E2E
trainer RE-INITIALIZES the conditioner with normal(0, 0.1) heads + zero
biases; the rebuild kept He-uniform.  This sweep isolates that (reinit
on/off), the gradient fix (fixed/severed), the train-time decode mode
(random, matching the reference, vs fix, matching the evaluator), and the
loss weighting (lc_alpha x reg_weight).

All arms reuse ONE rebuild VAE leg (seed-0 deterministic); the torch
reference comparator is the 3-seed mean already measured in
docs/artifacts/h2h_e2e.json (same data: the generator is seed-fixed).

Usage: python scripts/e2e_mechanism_sweep.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from head_to_head import make_data, make_lc_data, run_rebuild_e2e  # noqa: E402

CFG = dict(params=32, time=50, nodes=2048, batch=8, lr=1e-3, alpha=1e6,
           vae_epochs=200, epochs=600, filters=(64, 32, 16, 8),
           filters_lc=(32, 16))

ARMS = [
    # name, sever, reinit, decode_mode, lc_alpha, reg_weight, seeds
    ("severed_reinit",       True,  True,  "random", 10.0, 1e-3, 3),
    ("fixed_reinit",         False, True,  "random", 10.0, 1e-3, 3),
    ("fixed_noreinit",       False, False, "random", 10.0, 1e-3, 1),
    ("severed_noreinit",     True,  False, "random", 10.0, 1e-3, 1),
    ("fixed_reinit_decfix",  False, True,  "fix",    10.0, 1e-3, 3),
    ("fixed_reinit_a100",    False, True,  "random", 100.0, 1e-3, 1),
    ("fixed_reinit_r1",      False, True,  "random", 10.0, 1.0,  1),
    ("fixed_decfix_r1",      False, True,  "fix",    10.0, 1.0,  1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="docs/artifacts/e2e_mechanism_sweep.json")
    args = ap.parse_args()

    c = CFG
    scaled = make_data(c["params"], c["time"], c["nodes"])
    x, _, _ = make_lc_data(c["params"], 4, 32, 8, 3)

    cache = None
    results = {}
    for name, sever, reinit, mode, lc_alpha, reg_w, seeds in ARMS:
        per_seed = []
        for seed in range(seeds):
            out, cache = run_rebuild_e2e(
                scaled, x, c["vae_epochs"], c["epochs"], c["batch"], c["lr"],
                c["alpha"], list(c["filters"]), list(c["filters_lc"]),
                lc_alpha, reg_w, sever_recon_gradient=sever,
                vae_cache=cache, seed=seed, reinit=reinit, decode_mode=mode)
            per_seed.append(out)
            print(f"{name}[{seed}]: recon={out['recon_mse']:.4e} "
                  f"reg_main={out['reg_main_mse']:.4e} "
                  f"reg_hier={out['reg_hier_mse']:.4e}", flush=True)
        agg = {k: float(np.mean([r[k] for r in per_seed])) for k in per_seed[0]}
        agg["recon_mse_per_seed"] = [r["recon_mse"] for r in per_seed]
        results[name] = agg

    # torch reference comparator (same data/config, measured round 3)
    ref_path = os.path.join(REPO, "docs/artifacts/h2h_e2e.json")
    ref = json.load(open(ref_path))["reference"] if os.path.exists(ref_path) \
        else None

    blob = {"config": {k: (list(v) if isinstance(v, tuple) else v)
                       for k, v in c.items()},
            "arms": results, "reference_round3": ref}
    if ref:
        blob["ratios_vs_reference"] = {
            name: r["recon_mse"] / ref["recon_mse"]
            for name, r in results.items()}
    with open(os.path.join(REPO, args.json), "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob.get("ratios_vs_reference", {}), indent=1))


if __name__ == "__main__":
    main()
