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
if REPO not in sys.path:
    sys.path.insert(0, REPO)


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


def _stub_reference_imports():
    """Stub modules the reference imports at module level but these
    comparisons never exercise (torchinfo model summaries;
    skimage.util.random_noise in the unused image-noise path; torchvision
    transforms; natsort for image-directory listing)."""
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
    if "natsort" not in sys.modules:
        natsort = types.ModuleType("natsort")
        natsort.natsorted = sorted
        sys.modules["natsort"] = natsort
    # The reference's datasets call .pin_memory() unconditionally
    # (utils.py:153, 639); on a host with no accelerator torch raises.
    # No-op it — pinning is a transfer optimization, not semantics.
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.pin_memory = lambda self, *a, **k: self
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def run_reference(scaled, epochs, batch, lr, alpha, filters, workdir):
    """Train the actual reference implementation (torch CPU) and return
    (final recon MSE, final KL, histories, wall seconds)."""
    import torch

    _stub_reference_imports()
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


def run_rebuild(scaled, epochs, batch, lr, alpha, filters,
                dtype="float32", platform="cpu"):
    """Train this framework with the same hyperparameters (CPU backend for a
    same-host comparison; ``platform='tpu'`` for the bf16-on-hardware run)
    and return (final MSE, final KL, hist, wall s, (trainer, eval_params))."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # else: leave the environment default (this container pins the TPU
    # plugin via sitecustomize; overriding the name breaks plugin lookup)
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.train.vae_trainer import VAETrainer

    num_param, num_time, num_node = scaled.shape
    cfg = VAEConfig(
        num_param=num_param, num_time=num_time, num_node=num_node,
        latent_dim_end=32, latent_dim=8, num_filter_enc=list(filters),
        small=True, n_epochs=epochs, batch_size=batch, lr=lr, alpha=alpha,
        dtype=dtype,
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
    }, wall, (trainer, params)


# ---------------------------------------------------------------------------
# LC stage: supervised latent regression, reference trainer vs LCTrainer
# (reference modules/latent_conditioner.py:213-386)
# ---------------------------------------------------------------------------

def make_lc_data(num_param=32, n_feat=4, latent_dim_end=32, latent_dim=8,
                 size2=3, seed=0):
    """Synthetic LC regression task: smooth random teacher mapping physical
    params -> (main latent, hierarchical latents), mimicking the pipeline's
    scaled-latent targets in [-0.7, 0.7]."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((num_param, n_feat)).astype(np.float32)
    w1 = rng.standard_normal((n_feat, latent_dim_end)).astype(np.float32)
    w2 = rng.standard_normal((n_feat, size2 * latent_dim)).astype(np.float32)
    y1 = 0.7 * np.tanh(x @ w1) + 0.01 * rng.standard_normal(
        (num_param, latent_dim_end)).astype(np.float32)
    y2f = 0.7 * np.tanh(x @ w2) + 0.01 * rng.standard_normal(
        (num_param, size2 * latent_dim)).astype(np.float32)
    # scale x like the pipeline's csv path (data_preprocess.py:167-195)
    from sklearn.preprocessing import MinMaxScaler as SkMinMax

    x_scaled = SkMinMax(feature_range=(-0.7, 0.7)).fit_transform(x)
    return (x_scaled.astype(np.float32), y1.astype(np.float32),
            y2f.reshape(num_param, size2, latent_dim).astype(np.float32))


def make_image_lc_data(num_param=64, img=64, latent_dim_end=32, latent_dim=8,
                       size2=3, seed=0):
    """Synthetic image-LC task: 4 shape parameters -> binary OUTLINE images
    (the pixel statistics of the pipeline's cv2 resize+threshold-150 ingest,
    latent_conditioner.py:31-57) + smooth teacher latent targets of the same
    4 parameters.  Returns (x_flat in {0,1}, y1, y2, params)."""
    rng = np.random.default_rng(seed)
    p = rng.uniform(-1.0, 1.0, size=(num_param, 4)).astype(np.float32)

    yy, xx = np.mgrid[0:img, 0:img].astype(np.float32)
    cx = (0.5 + 0.15 * p[:, 0, None, None]) * img
    cy = (0.5 + 0.15 * p[:, 1, None, None]) * img
    a = (0.18 + 0.10 * (p[:, 2, None, None] * 0.5 + 0.5)) * img
    b = (0.18 + 0.10 * (p[:, 3, None, None] * 0.5 + 0.5)) * img
    q = ((xx - cx) / a) ** 2 + ((yy - cy) / b) ** 2
    # outline band ~2px wide, intensity 255 -> threshold-150 keeps it binary
    outline = (np.abs(np.sqrt(np.maximum(q, 1e-12)) - 1.0)
               < (1.5 / np.minimum(a, b))).astype(np.uint8) * 255
    # the ingest pipeline: threshold at 150 -> {0, 255} -> /255
    x = (outline > 150).astype(np.float32).reshape(num_param, img * img)

    w1 = rng.standard_normal((4, latent_dim_end)).astype(np.float32)
    w2 = rng.standard_normal((4, size2 * latent_dim)).astype(np.float32)
    y1 = 0.7 * np.tanh(p @ w1)
    y2 = 0.7 * np.tanh(p @ w2)
    return (x, y1.astype(np.float32),
            y2.reshape(num_param, size2, latent_dim).astype(np.float32), p)


def _lc_final_metrics_torch(model, x, y1, y2):
    """Deterministic full-set eval: (main MSE, hier MSE)."""
    import torch

    model.eval()
    with torch.no_grad():
        p1, p2 = model(torch.from_numpy(x).float())
        m1 = float(torch.nn.MSELoss()(p1, torch.from_numpy(y1).float()))
        m2 = float(torch.nn.MSELoss()(p2.reshape(-1),
                                      torch.from_numpy(y2).reshape(-1).float()))
    return m1, m2


def run_reference_lc(x, y1, y2, epochs, batch, lr, wd, filters_lc, workdir,
                     seed=0, image=False):
    """Train the reference's train_latent_conditioner (torch CPU).

    ``image=True`` uses the CNN LatentConditionerImg with the base trainer
    exactly as the reference INTENDS for images: its shipped dispatch
    (`train_latent_conditioner_with_enhancements`, use_enhanced_loss unset
    in condition.txt) falls through to the base trainer but passes an extra
    ``image_size`` positional that TypeErrors (SURVEY §2.5) — we make the
    intended call with the correct arity."""
    import torch
    from torch.utils.data import DataLoader, random_split

    _stub_reference_imports()
    from modules.latent_conditioner import train_latent_conditioner

    num_param, n_feat = x.shape
    size2, latent_dim = y2.shape[1], y2.shape[2]
    torch.manual_seed(seed)
    if image:
        from modules.latent_conditioner_model_cnn import LatentConditionerImg

        img = int(np.sqrt(n_feat))
        model = LatentConditionerImg(filters_lc, y1.shape[1], (img, img),
                                     latent_dim, size2, n_feat,
                                     dropout_rate=0.1, use_attention=True)
    else:
        from modules.latent_conditioner_model_parametric import (
            LatentConditioner)

        model = LatentConditioner(filters_lc, y1.shape[1], n_feat,
                                  latent_dim, size2, dropout_rate=0.1)

    from modules.utils import LatentConditionerDataset

    ds = LatentConditionerDataset(x, y1, y2, load_all=True)
    n_train = int(0.7 * num_param)
    tr, va = random_split(ds, [n_train, num_param - n_train],
                          generator=torch.Generator().manual_seed(seed))
    dl = DataLoader(tr, batch_size=batch, shuffle=True, drop_last=True)
    vdl = DataLoader(va, batch_size=batch, shuffle=False)

    cwd = os.getcwd()
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    os.makedirs("checkpoints", exist_ok=True)
    os.makedirs("model_save", exist_ok=True)
    try:
        t0 = time.time()
        train_latent_conditioner(epochs, dl, vdl, model, lr,
                                 weight_decay=wd, is_image_data=image)
        wall = time.time() - t0
    finally:
        os.chdir(cwd)
    m1, m2 = _lc_final_metrics_torch(model, x, y1, y2)
    return {"main_mse": m1, "hier_mse": m2, "wall_sec": wall}


def run_rebuild_lc(x, y1, y2, epochs, batch, lr, wd, filters_lc, seed=0,
                   image=False, loss_mode="standard", platform="cpu"):
    """Train LCTrainer (jax CPU by default; platform='tpu' runs the rebuild
    leg on the real chip) on the identical data."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simulgen_vae_tpu.train.lc_trainer import LCTrainer

    if image:
        from simulgen_vae_tpu.models.conditioner_cnn import (
            LatentConditionerImg, sn_filter)

        model = LatentConditionerImg(list(filters_lc), y1.shape[1],
                                     y2.shape[2], y2.shape[1],
                                     dropout_rate=0.1, use_attention=True)
        lc_sn = sn_filter
    else:
        from simulgen_vae_tpu.models.conditioner_mlp import LatentConditioner

        model = LatentConditioner(list(filters_lc), y1.shape[1], x.shape[1],
                                  y2.shape[2], y2.shape[1], dropout_rate=0.1)
        lc_sn = None
    trainer = LCTrainer(model, epochs=epochs, lr=lr, batch_size=batch,
                        weight_decay=wd, is_image_data=image,
                        loss_mode=loss_mode, sn_filter=lc_sn)
    t0 = time.time()
    state, _ = trainer.fit(x, y1, y2, jax.random.PRNGKey(seed), val_split=0.3)
    wall = time.time() - t0
    predict = trainer.predict_fn(state)
    p1, p2 = predict(jnp.asarray(x))
    m1 = float(np.mean((np.asarray(p1) - y1) ** 2))
    m2 = float(np.mean((np.asarray(p2) - y2) ** 2))
    return {"main_mse": m1, "hier_mse": m2, "wall_sec": wall}


def stage_lc(args):
    """Multi-seed LC comparison: at this dataset size (tens of samples) the
    seed-to-seed spread is comparable to the ref-vs-rebuild gap, so single
    seeds mislead — compare mean final MSEs over ``--seeds`` runs.

    ``--input_type image`` runs the CNN conditioner on threshold-style
    outline images, reference base-loss (its intended image path) vs the
    rebuild in BOTH loss modes (standard 10*MSE+MSE and enhanced) — the
    evidence for the CLI's image-path loss-mode default (VERDICT r3 #4)."""
    image = args.input_type == "image"
    if image:
        x, y1, y2, _ = make_image_lc_data(args.params, args.image_size,
                                          32, 8, 3)
    else:
        x, y1, y2 = make_lc_data(args.params, 4, 32, 8, 3)
    filters_lc = [int(f) for f in args.filters.split(",")]
    modes = ["standard", "enhanced"] if image else ["standard"]
    refs, ours = [], {m: [] for m in modes}
    for seed in range(args.seeds):
        print(f"== seed {seed}: reference train_latent_conditioner "
              f"({args.epochs} epochs, image={image}) ==", flush=True)
        r = run_reference_lc(x, y1, y2, args.epochs, args.batch, args.lr,
                             1e-4, filters_lc, args.workdir, seed=seed,
                             image=image)
        print(f"reference[{seed}]: main={r['main_mse']:.3e} "
              f"hier={r['hier_mse']:.3e} wall={r['wall_sec']:.1f}s",
              flush=True)
        refs.append(r)
        for mode in modes:
            print(f"== seed {seed}: rebuild LCTrainer ({mode}) ==",
                  flush=True)
            o = run_rebuild_lc(x, y1, y2, args.epochs, args.batch, args.lr,
                               1e-4, filters_lc, seed=seed, image=image,
                               loss_mode=mode, platform=args.platform)
            print(f"rebuild/{mode}[{seed}]: main={o['main_mse']:.3e} "
                  f"hier={o['hier_mse']:.3e} wall={o['wall_sec']:.1f}s",
                  flush=True)
            ours[mode].append(o)

    def agg(runs):
        return {k: float(np.mean([r[k] for r in runs])) for k in runs[0]} | {
            f"{k}_per_seed": [r[k] for r in runs]
            for k in ("main_mse", "hier_mse")}

    ref = agg(refs)
    out = {"stage": "lc", "config": vars(args), "reference": ref}
    for mode in modes:
        our = agg(ours[mode])
        suffix = "" if mode == "standard" else f"_{mode}"
        out[f"rebuild{suffix}"] = our
        out[f"main_mse_ratio_rebuild{suffix}_over_ref"] = (
            our["main_mse"] / ref["main_mse"])
        out[f"hier_mse_ratio_rebuild{suffix}_over_ref"] = (
            our["hier_mse"] / ref["hier_mse"])
    return out


# ---------------------------------------------------------------------------
# E2E stage: conditioner trained through the frozen decoder
# (reference modules/latent_conditioner_e2e.py:213-561; the reference's
# recon gradient is severed at e2e.py:66-92, so it trains reg-only)
# ---------------------------------------------------------------------------

def _extract_reference_latents(model, data_tn, filters):
    """Per-sample latents via the reference's evaluate_vae_reconstruction
    (recon_iter=1, no images) — the pipeline step at SimulGen-VAE.py:326."""
    import torch
    from torch.utils.data import DataLoader, Dataset

    from modules.utils import evaluate_vae_reconstruction as ref_eval

    class _DS(Dataset):
        def __init__(self, arr):
            self.x_data = torch.from_numpy(arr).float()

        def __len__(self):
            return self.x_data.shape[0]

        def __getitem__(self, i):
            return self.x_data[i]

    dl = DataLoader(_DS(data_tn), batch_size=1, shuffle=False)
    lv, hier, _, _, _ = ref_eval(
        model, dl, "cpu", data_tn.shape[0], filters, 8, 32,
        recon_iter=1, dataset_name="h2h", save_images=False,
    )
    return np.asarray(lv, np.float32), np.asarray(hier, np.float32)


def run_reference_e2e(scaled, x, epochs_vae, epochs_e2e, batch, lr, alpha,
                      filters, filters_lc, lc_alpha, reg_weight, workdir,
                      seed=0, vae_cache=None, image=False):
    """Full reference E2E path: torch VAE -> latents -> scalers ->
    train_latent_conditioner_e2e (csv-mode MLP, recon gradient severed by the
    reference's own sklearn descale).

    ``seed`` varies only the E2E phase (conditioner init, split, shuffling) —
    the VAE leg is deterministic and reused across seeds via ``vae_cache``
    (mirrors the rebuild side, so both sides share one frozen decoder per
    study and seed spread measures the conditioner phase alone)."""
    import torch
    from torch.utils.data import DataLoader, random_split

    if vae_cache is None:
        # trains the torch VAE and saves workdir/model_save/SimulGen-VAE
        ref_vae_mse, _, _, vae_wall = run_reference(
            scaled, epochs_vae, batch, lr, alpha, filters, workdir)
        vae_cache = {"vae_mse": ref_vae_mse, "vae_wall": vae_wall}
    ref_vae_mse = vae_cache["vae_mse"]
    vae_wall = vae_cache["vae_wall"]

    from modules.data_preprocess import latent_conditioner_scaler as ref_lcs
    from modules.latent_conditioner_e2e import train_latent_conditioner_e2e
    from modules.latent_conditioner_model_parametric import LatentConditioner
    from modules.utils import E2ELatentConditionerDataset

    data_tn = np.ascontiguousarray(np.swapaxes(scaled, 1, 2)).astype(
        np.float32)
    num_param = scaled.shape[0]

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        model = torch.load("model_save/SimulGen-VAE", weights_only=False)
        model.eval()
        lv, hier = _extract_reference_latents(model, data_tn, filters)
        size2, latent_dim = hier.shape[1], hier.shape[2]

        y1, lv_scaler = ref_lcs(lv, "model_save/latent_vectors_scaler.pkl")
        y2_flat, xs_scaler = ref_lcs(hier.reshape(num_param, -1),
                                     "model_save/xs_scaler.pkl")
        y2 = y2_flat.reshape(num_param, size2, latent_dim)

        torch.manual_seed(seed)
        if image:
            from modules.latent_conditioner_model_cnn import (
                LatentConditionerImg)

            img = int(np.sqrt(x.shape[1]))
            lc = LatentConditionerImg(filters_lc, y1.shape[1], (img, img),
                                      latent_dim, size2, x.shape[1],
                                      dropout_rate=0.1, use_attention=True)
        else:
            lc = LatentConditioner(filters_lc, y1.shape[1], x.shape[1],
                                   latent_dim, size2, dropout_rate=0.1)
        ds = E2ELatentConditionerDataset(
            np.float32(x), np.float32(y1), np.float32(y2),
            np.float32(data_tn), load_all=False)
        n_train = int(0.7 * num_param)
        tr, va = random_split(ds, [n_train, num_param - n_train],
                              generator=torch.Generator().manual_seed(seed))
        dl = DataLoader(tr, batch_size=batch, shuffle=True, drop_last=True)
        vdl = DataLoader(va, batch_size=batch, shuffle=False)

        config = {"LC_alpha": lc_alpha, "e2e_loss_function": "MSE",
                  "use_latent_regularization": 1,
                  "latent_reg_weight": reg_weight,
                  "e2e_vae_model_path": "model_save/SimulGen-VAE"}
        os.makedirs("checkpoints", exist_ok=True)
        t0 = time.time()
        train_latent_conditioner_e2e(epochs_e2e, dl, vdl, lc, lr, 1e-5,
                                     image, 256, config)
        wall = time.time() - t0

        # deterministic final eval: predict -> descale -> decode(mode='fix')
        from modules.latent_conditioner_e2e import descale_latent_predictions

        lc.eval()
        with torch.no_grad():
            xt = torch.from_numpy(x).float()
            p1, p2 = lc(xt)
            reg_main = float(torch.nn.MSELoss()(
                p1, torch.from_numpy(y1).float()))
            reg_hier = float(torch.nn.MSELoss()(
                p2.reshape(-1), torch.from_numpy(y2).reshape(-1).float()))
            d1, d2 = descale_latent_predictions(p1, p2, lv_scaler, xs_scaler)
            xs_list = [d2[:, i, :] for i in range(size2)]
            recon, _ = model.decoder(d1, xs_list, mode="fix")
            recon_mse = float(torch.nn.MSELoss()(
                recon, torch.from_numpy(data_tn).float()))
    finally:
        os.chdir(cwd)
    return {"recon_mse": recon_mse, "reg_main_mse": reg_main,
            "reg_hier_mse": reg_hier, "vae_recon_mse": ref_vae_mse,
            "wall_sec": wall, "vae_wall_sec": vae_wall}, vae_cache


def run_rebuild_e2e(scaled, x, epochs_vae, epochs_e2e, batch, lr, alpha,
                    filters, filters_lc, lc_alpha, reg_weight,
                    sever_recon_gradient=False, vae_cache=None, seed=0,
                    reinit=True, decode_mode="random", image=False,
                    platform="cpu"):
    """Full rebuild E2E path; ``sever_recon_gradient=True`` replicates the
    reference's detached recon term to isolate the gradient fix."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simulgen_vae_tpu.data.scaler import latent_conditioner_scaler
    from simulgen_vae_tpu.evaluation import evaluate_vae_reconstruction
    from simulgen_vae_tpu.models.conditioner_mlp import LatentConditioner
    from simulgen_vae_tpu.train.lc_e2e_trainer import E2ETrainer

    num_param = scaled.shape[0]
    if vae_cache is None:
        vae_mse, _, _, vae_wall, (trainer, params) = run_rebuild(
            scaled, epochs_vae, batch, lr, alpha, filters,
            platform=platform)
        lv, hier, _, _, _ = evaluate_vae_reconstruction(
            trainer.model, params, scaled, jax.random.PRNGKey(1),
            recon_iter=1, batch_size=batch, verbose=False)
        y1, lv_scaler = latent_conditioner_scaler(lv, None)
        y2_flat, xs_scaler = latent_conditioner_scaler(
            hier.reshape(num_param, -1), None)
        y2 = y2_flat.reshape(hier.shape)
        vae_cache = dict(vae_mse=vae_mse, vae_wall=vae_wall, trainer=trainer,
                         params=params, y1=y1, y2=y2, lv_scaler=lv_scaler,
                         xs_scaler=xs_scaler)
    c = vae_cache
    size2, latent_dim = c["y2"].shape[1], c["y2"].shape[2]

    lc_sn = None
    if image:
        from simulgen_vae_tpu.models.conditioner_cnn import (
            LatentConditionerImg, sn_filter)

        lc = LatentConditionerImg(list(filters_lc), c["y1"].shape[1],
                                  latent_dim, size2, dropout_rate=0.1,
                                  use_attention=True)
        lc_sn = sn_filter
    else:
        lc = LatentConditioner(list(filters_lc), c["y1"].shape[1], x.shape[1],
                               latent_dim, size2, dropout_rate=0.1)
    trainer = E2ETrainer(
        lc, c["trainer"].model, c["params"], c["lv_scaler"], c["xs_scaler"],
        epochs=epochs_e2e, lr=lr, batch_size=batch, weight_decay=1e-5,
        loss_function="MSE", lc_alpha=lc_alpha,
        use_latent_regularization=True, latent_reg_weight=reg_weight,
        sever_recon_gradient=sever_recon_gradient,
        reinit=reinit, decode_mode=decode_mode, sn_filter=lc_sn,
    )
    t0 = time.time()
    state, _ = trainer.fit(x, c["y1"], c["y2"], scaled,
                           jax.random.PRNGKey(seed), val_split=0.3)
    wall = time.time() - t0

    # deterministic final eval mirroring the torch side
    out = trainer.lc_model.apply(
        {"params": state.params, **({"batch_stats": state.batch_stats}
                                    if state.batch_stats else {})},
        jnp.asarray(x), deterministic=True)
    p1, p2 = out
    reg_main = float(np.mean((np.asarray(p1) - c["y1"]) ** 2))
    reg_hier = float(np.mean((np.asarray(p2) - c["y2"]) ** 2))
    z, xs = trainer._descale(p1, p2)
    from simulgen_vae_tpu.models.vae import VAE

    xs_list = [xs[:, i] for i in range(size2)]
    recon, _, _ = c["trainer"].model.apply(
        {"params": c["params"]}, z, xs_list, mode="fix",
        method=VAE.decode, rngs={"sample": jax.random.PRNGKey(0)})
    recon_mse = float(np.mean(
        (np.asarray(recon, np.float32) - scaled) ** 2))
    return {"recon_mse": recon_mse, "reg_main_mse": reg_main,
            "reg_hier_mse": reg_hier, "vae_recon_mse": c["vae_mse"],
            "wall_sec": wall, "vae_wall_sec": c["vae_wall"]}, vae_cache


def stage_e2e(args):
    filters = [int(f) for f in args.filters.split(",")]
    if len(filters) != 4:
        raise SystemExit("--stage e2e needs 4 encoder filters (the reference "
                         "decoder-reshape hardcodes 3 hierarchical levels, "
                         "latent_conditioner_e2e.py:362-369)")
    image = args.input_type == "image"
    filters_lc = [int(f) for f in args.filters_lc.split(",")] \
        if args.filters_lc else [32, 16]
    scaled = make_data(args.params, args.time, args.nodes)
    if image:
        x, _, _, _ = make_image_lc_data(args.params, args.image_size,
                                        32, 8, 3)
    else:
        x, _, _ = make_lc_data(args.params, 4, 32, 8, 3)

    # one frozen decoder per side (the VAE legs are seed-0 deterministic and
    # expensive); --seeds varies the conditioner phase only, mirroring
    # stage_lc: at tens of samples the seed spread rivals the ref-vs-rebuild
    # gap, so single seeds mislead.
    refs, ours_list = [], []
    ref_cache = cache = None
    for seed in range(args.seeds):
        print(f"== seed {seed}: reference E2E: VAE {args.vae_epochs} ep + "
              f"E2E {args.epochs} ep ==", flush=True)
        ref, ref_cache = run_reference_e2e(
            scaled, x, args.vae_epochs, args.epochs, args.batch, args.lr,
            args.alpha, filters, filters_lc, args.lc_alpha, args.reg_weight,
            args.workdir, seed=seed, vae_cache=ref_cache, image=image)
        print(f"reference[{seed}]: recon={ref['recon_mse']:.3e} "
              f"reg_main={ref['reg_main_mse']:.3e} "
              f"reg_hier={ref['reg_hier_mse']:.3e}", flush=True)
        refs.append(ref)

        print(f"== seed {seed}: rebuild E2E (fixed gradient) ==", flush=True)
        ours, cache = run_rebuild_e2e(
            scaled, x, args.vae_epochs, args.epochs, args.batch, args.lr,
            args.alpha, filters, filters_lc, args.lc_alpha, args.reg_weight,
            vae_cache=cache, seed=seed, image=image,
            decode_mode=args.decode_mode, platform=args.platform)
        print(f"rebuild[{seed}]:   recon={ours['recon_mse']:.3e} "
              f"reg_main={ours['reg_main_mse']:.3e} "
              f"reg_hier={ours['reg_hier_mse']:.3e}", flush=True)
        ours_list.append(ours)

    print(f"== rebuild E2E (severed gradient, reference-defect probe) ==",
          flush=True)
    severed, _ = run_rebuild_e2e(scaled, x, args.vae_epochs, args.epochs,
                                 args.batch, args.lr, args.alpha, filters,
                                 filters_lc, args.lc_alpha, args.reg_weight,
                                 sever_recon_gradient=True, vae_cache=cache,
                                 image=image, decode_mode=args.decode_mode,
                                 platform=args.platform)
    print(f"severed:   recon={severed['recon_mse']:.3e} "
          f"reg_main={severed['reg_main_mse']:.3e}", flush=True)

    def agg(runs):
        return {k: float(np.mean([r[k] for r in runs])) for k in runs[0]} | {
            "recon_mse_per_seed": [r["recon_mse"] for r in runs]}

    ref, ours = agg(refs), agg(ours_list)
    return {
        "stage": "e2e", "config": vars(args),
        "reference": ref, "rebuild_fixed_gradient": ours,
        "rebuild_severed_gradient": severed,
        "recon_mse_ratio_rebuild_over_ref":
            ours["recon_mse"] / ref["recon_mse"],
        "fixed_vs_severed_recon_improvement":
            severed["recon_mse"] / ours["recon_mse"],
    }


def stage_vae(args):
    filters = [int(f) for f in args.filters.split(",")]
    scaled = make_data(args.params, args.time, args.nodes)

    cache_key = (f"{args.epochs}-{args.params}x{args.time}x{args.nodes}"
                 f"-b{args.batch}-{args.filters}-a{args.alpha}-lr{args.lr}")
    cached = None
    if args.ref_cache and os.path.exists(args.ref_cache):
        with open(args.ref_cache) as f:
            blob = json.load(f)
        if blob.get("key") == cache_key:
            cached = blob
            print(f"reference results reused from {args.ref_cache}",
                  flush=True)
    if cached is None:
        print(f"== torch reference (CPU, f32): {args.epochs} epochs ==",
              flush=True)
        ref_mse, ref_kl, ref_hist, ref_wall = run_reference(
            scaled, args.epochs, args.batch, args.lr, args.alpha, filters,
            args.workdir,
        )
        if args.ref_cache:
            with open(args.ref_cache, "w") as f:
                json.dump({"key": cache_key, "mse": ref_mse, "kl": ref_kl,
                           "hist": ref_hist, "wall": ref_wall}, f)
    else:
        ref_mse, ref_kl = cached["mse"], cached["kl"]
        ref_hist, ref_wall = cached["hist"], cached["wall"]
    print(f"reference: recon_mse={ref_mse:.3e} kl={ref_kl:.3f} "
          f"wall={ref_wall:.1f}s", flush=True)

    print(f"== rebuild (jax {args.platform}, {args.dtype}): "
          f"{args.epochs} epochs ==", flush=True)
    our_mse, our_kl, our_hist, our_wall, _ = run_rebuild(
        scaled, args.epochs, args.batch, args.lr, args.alpha, filters,
        dtype=args.dtype, platform=args.platform,
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
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["vae", "lc", "e2e"], default="vae")
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--vae_epochs", type=int, default=60,
                    help="(e2e stage) epochs for the upstream VAE train")
    ap.add_argument("--params", type=int, default=16)
    ap.add_argument("--time", type=int, default=50)
    ap.add_argument("--nodes", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--alpha", type=float, default=1e6)
    ap.add_argument("--lc_alpha", type=float, default=10.0)
    ap.add_argument("--reg_weight", type=float, default=1e-3)
    ap.add_argument("--filters", type=str, default="64,32,16,8")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="(vae stage) rebuild compute dtype; reference stays "
                         "f32 (its train.py:16 has no AMP)")
    ap.add_argument("--platform", type=str, default="cpu",
                    help="(vae stage) rebuild backend: cpu for same-host "
                         "fairness, tpu to measure the benched configuration")
    ap.add_argument("--seeds", type=int, default=3,
                    help="(lc stage) runs per side, compared by mean")
    ap.add_argument("--ref_cache", type=str, default=None,
                    help="(vae stage) json path caching the reference run "
                         "so dtype sweeps retrain only the rebuild side")
    ap.add_argument("--input_type", choices=["csv", "image"], default="csv",
                    help="(lc/e2e stages) csv -> MLP conditioner, image -> "
                         "CNN conditioner on synthetic outline images")
    ap.add_argument("--image_size", type=int, default=64,
                    help="(lc/e2e image mode) square image side")
    ap.add_argument("--filters_lc", type=str, default=None,
                    help="(e2e stage) conditioner filters, default 32,16")
    ap.add_argument("--decode_mode", choices=["random", "fix"],
                    default="random",
                    help="(e2e stage) rebuild train-time decode mode; "
                         "'random' matches the reference")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--workdir", type=str, default="/tmp/h2h_reference")
    args = ap.parse_args()

    if args.stage == "vae":
        out = stage_vae(args)
    elif args.stage == "lc":
        out = stage_lc(args)
    else:
        out = stage_e2e(args)

    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)} |
                     {"stage": args.stage}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
