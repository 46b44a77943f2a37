#!/usr/bin/env python
"""Head-to-head quality parity: the actual torch reference vs this rebuild.

Trains BOTH implementations on the same synthetic ensemble with matched
hyperparameters (epochs, batch, lr, alpha, beta warmup schedule, MSE loss,
AdamW defaults, cosine warm restarts, spectral norm, on-the-fly
augmentation) and reports final reconstruction MSE and ELBO terms side by
side.  This is the "matched recon MSE + ELBO" acceptance clause of
BASELINE.json, measured rather than assumed.

The reference is IMPORTED from /root/reference and executed as-is
(``modules/train.py:50-256``) on torch CPU — no reference code is copied.
Trajectories use different RNGs (torch vs jax) so the comparison is of
converged quality levels, not per-step numerics (those are covered by
tests/test_model_parity.py against a torch oracle).

Usage:
  python scripts/head_to_head.py --epochs 800 [--nodes 2048] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def make_data(num_param=16, num_time=50, num_node=2048, seed=0):
    sys.path.insert(0, REPO)
    from simulgen_vae_tpu.data.dataset import synthetic_dataset
    from simulgen_vae_tpu.data.scaler import data_scaler

    data = synthetic_dataset(num_param, num_time, num_node, seed=seed)
    scaled, _, _ = data_scaler(data, num_time, num_node, save_path=None)
    return scaled  # [param, time, node], float32 in (-0.7, 0.7)


def eval_torch(model, data_tn, alpha, n_eval=4):
    """Final-quality eval: mean recon MSE (always-MSE monitor) and summed KL
    over the full set, averaged over n_eval stochastic forward passes."""
    import torch

    model.eval()
    x = torch.from_numpy(data_tn).float()
    mses, kls = [], []
    with torch.no_grad():
        for i in range(n_eval):
            torch.manual_seed(1000 + i)
            _, _, kl_losses, recon_mse = model(x)
            mses.append(float(recon_mse))
            kls.append(float(sum(kl_losses)))
    return float(np.mean(mses)), float(np.mean(kls))


def run_reference(scaled, epochs, batch, lr, alpha, filters, workdir):
    """Train the actual reference implementation (torch CPU) and return
    (final recon MSE, final KL, histories, wall seconds)."""
    import torch

    # Stub modules the reference imports at module level but this comparison
    # never exercises (torchinfo model summaries; skimage.util.random_noise
    # used only by the reference's unused image-noise path).
    sys.modules.setdefault(
        "torchinfo", types.SimpleNamespace(summary=lambda *a, **k: None)
    )
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        util = types.ModuleType("skimage.util")

        def _unavailable(*a, **k):
            raise RuntimeError("skimage stubbed out in head_to_head")

        util.random_noise = _unavailable
        skimage.util = util
        sys.modules["skimage"] = skimage
        sys.modules["skimage.util"] = util
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        transforms.v2 = types.SimpleNamespace()
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
    sys.path.insert(0, REFERENCE)
    from modules.augmentation import create_augmented_dataloaders
    from modules.train import train

    torch.manual_seed(0)
    # reference layout: [param, node, time]
    data_tn = np.ascontiguousarray(np.swapaxes(scaled, 1, 2)).astype(
        np.float32
    )

    cwd = os.getcwd()
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    os.makedirs("model_save", exist_ok=True)
    try:
        train_dl, val_dl = create_augmented_dataloaders(
            data_tn, batch, load_all=False, val_split=0.2, num_workers=0
        )
        t0 = time.time()
        loss_hist, recon_hist, kl_hist, val_hist = train(
            epochs, batch, train_dl, val_dl, lr,
            filters, filters[::-1], data_tn.shape[1],
            32, 8, data_tn.shape[2], alpha,
            torch.nn.MSELoss(), True, False,
        )
        wall = time.time() - t0
        model = torch.load("model_save/SimulGen-VAE", weights_only=False)
    finally:
        os.chdir(cwd)

    mse, kl = eval_torch(model, data_tn, alpha)
    return mse, kl, {
        "loss": loss_hist.tolist(), "recon": recon_hist.tolist(),
        "kl": kl_hist.tolist(),
    }, wall


def run_rebuild(scaled, epochs, batch, lr, alpha, filters):
    """Train this framework with the same hyperparameters (CPU backend for a
    same-host comparison) and return (final MSE, final KL, hist, wall s)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    num_param, num_time, num_node = scaled.shape
    cfg = VAEConfig(
        num_param=num_param, num_time=num_time, num_node=num_node,
        latent_dim_end=32, latent_dim=8, num_filter_enc=list(filters),
        small=True, n_epochs=epochs, batch_size=batch, lr=lr, alpha=alpha,
    )
    trainer = VAETrainer(cfg, donate=False)

    t0 = time.time()
    state, hist = trainer.fit(scaled, jax.random.PRNGKey(0), epochs=epochs,
                              val_split=0.2, val_every=max(epochs // 10, 1))
    wall = time.time() - t0

    # identical final-quality eval: stochastic forwards over the full set
    params = trainer.eval_params(state)
    x = jnp.asarray(scaled)
    mses, kls = [], []
    for i in range(4):
        _, _, kl_terms, recon_mse = trainer.model.apply(
            {"params": params}, x, rngs={"sample": jax.random.PRNGKey(1000 + i)}
        )
        mses.append(float(recon_mse))
        kls.append(float(sum(kl_terms)))
    return float(np.mean(mses)), float(np.mean(kls)), {
        k: v.tolist() for k, v in hist.items()
        if k in ("loss", "recon_mse", "kl")
    }, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--params", type=int, default=16)
    ap.add_argument("--time", type=int, default=50)
    ap.add_argument("--nodes", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--alpha", type=float, default=1e6)
    ap.add_argument("--filters", type=str, default="64,32,16,8")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--workdir", type=str, default="/tmp/h2h_reference")
    args = ap.parse_args()

    filters = [int(f) for f in args.filters.split(",")]
    scaled = make_data(args.params, args.time, args.nodes)

    print(f"== torch reference (CPU): {args.epochs} epochs ==", flush=True)
    ref_mse, ref_kl, ref_hist, ref_wall = run_reference(
        scaled, args.epochs, args.batch, args.lr, args.alpha, filters,
        args.workdir,
    )
    print(f"reference: recon_mse={ref_mse:.3e} kl={ref_kl:.3f} "
          f"wall={ref_wall:.1f}s", flush=True)

    print(f"== rebuild (jax CPU): {args.epochs} epochs ==", flush=True)
    our_mse, our_kl, our_hist, our_wall = run_rebuild(
        scaled, args.epochs, args.batch, args.lr, args.alpha, filters
    )
    print(f"rebuild:   recon_mse={our_mse:.3e} kl={our_kl:.3f} "
          f"wall={our_wall:.1f}s", flush=True)

    out = {
        "config": vars(args),
        "reference": {"recon_mse": ref_mse, "kl": ref_kl,
                      "neg_elbo": args.alpha * ref_mse + ref_kl,
                      "wall_sec": ref_wall, "history": ref_hist},
        "rebuild": {"recon_mse": our_mse, "kl": our_kl,
                    "neg_elbo": args.alpha * our_mse + our_kl,
                    "wall_sec": our_wall, "history": our_hist},
        "mse_ratio_rebuild_over_ref": our_mse / ref_mse,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "config"
                      and not isinstance(v, dict)} | {
        "ref_mse": ref_mse, "our_mse": our_mse,
        "ref_neg_elbo": out["reference"]["neg_elbo"],
        "our_neg_elbo": out["rebuild"]["neg_elbo"],
    }))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
