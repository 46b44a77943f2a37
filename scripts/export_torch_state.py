#!/usr/bin/env python
"""Export a rebuild-trained VAE to the reference's torch artifact formats.

The reference persists ``model_save/SimulGen-VAE`` (full pickled
``modules.VAE_network.VAE``) and ``checkpoints/SimulGen-VAE.pth``
(state_dict) — ``/root/reference/modules/train.py:252-253``.  The rebuild
saves flax msgpack at the same paths (a deliberate format swap,
``utils/checkpoint.py:66-80``), which downstream torch consumers cannot
load.  This shim converts: flax params -> reference-keyed state_dict ->
(optionally) a full pickled reference VAE, so reference eval code can load a
rebuild-trained model unchanged.

Spectral norm: the rebuild's saved eval params are already the EFFECTIVE
weights (W/sigma applied — ``VAETrainer.eval_params``), so the exported
torch model carries plain weights with no spectral_norm parametrization;
its forward computes the same function the flax eval/generate path does.

Weight layout conversions (flax NWC -> torch NCW):

* Dense kernel ``[in, out]``           -> Linear weight ``[out, in]``
* Conv1d kernel ``[k, in, out]``       -> Conv1d weight ``[out, in, k]``
* decoder-block conv                   -> ConvTranspose1d weight
  ``[in, out, k]`` with flipped taps (the reference's UpsampleBlock uses
  ConvTranspose1d(stride=1), which equals a regular conv with reversed
  kernel — ``modules/decoder.py:17-44``)
* fused readout (kernel/bias/scale/norm_bias) -> ``recon.0`` Conv1d(k=1) +
  ``recon.1`` GroupNorm (``modules/decoder.py:117-121``)

Usage:
  python scripts/export_torch_state.py \
      [--model model_save/SimulGen-VAE] [--condition input_data/condition.txt]
      [--preset_file preset.txt] [--size small] \
      [--out checkpoints/SimulGen-VAE.pth] \
      [--full_model model_save/SimulGen-VAE.torch --reference /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _np(a):
    return np.asarray(a, dtype=np.float32)


def _conv(p):
    """flax Conv1d subtree {Conv_0: {kernel [k,in,out], bias}} -> torch."""
    k = _np(p["Conv_0"]["kernel"]).transpose(2, 1, 0)
    return k, _np(p["Conv_0"]["bias"])


def _convT(p):
    """Same, to ConvTranspose1d weight [in, out, k] with flipped taps."""
    k = np.flip(_np(p["Conv_0"]["kernel"]), axis=0).transpose(1, 2, 0)
    return np.ascontiguousarray(k), _np(p["Conv_0"]["bias"])


def _linear(p):
    return _np(p["kernel"]).T, _np(p["bias"])


def _gn(p):
    return _np(p["scale"]), _np(p["bias"])


def _put(sd, prefix, w, b):
    sd[prefix + ".weight"] = w
    sd[prefix + ".bias"] = b


def _stages(sub):
    """Number of Conv1d_{j}/NormAct_{j} stages in a flax block subtree."""
    return sum(1 for k in sub if k.startswith("Conv1d_"))


def _export_stage_seq(sd, sub, torch_prefix):
    """flax Conv1d_{j}/NormAct_{j} stages -> torch Sequential indices
    (conv at 3j, GN at 3j+1, GELU at 3j+2)."""
    for j in range(_stages(sub)):
        w, b = _conv(sub[f"Conv1d_{j}"])
        _put(sd, f"{torch_prefix}.{3 * j}", w, b)
        s, bb = _gn(sub[f"NormAct_{j}"])
        _put(sd, f"{torch_prefix}.{3 * j + 1}", s, bb)


def _export_injector(sd, sub, torch_prefix):
    """_LatentInjector -> Sequential(Linear, Unflatten, Conv k5, GN, GELU)."""
    w, b = _linear(sub["Dense_0"]["Dense_0"])
    _put(sd, f"{torch_prefix}.0", w, b)
    w, b = _conv(sub["Conv1d_0"])
    _put(sd, f"{torch_prefix}.2", w, b)
    s, bb = _gn(sub["NormAct_0"])
    _put(sd, f"{torch_prefix}.3", s, bb)


def _export_cond_head(sd, sub, torch_prefix):
    """_ConditionHead -> Sequential(ResidualBlock, GELU, Conv k3)."""
    _export_stage_seq(sd, sub["ResidualBlock_0"], f"{torch_prefix}.0._seq")
    w, b = _conv(sub["Conv1d_0"])
    _put(sd, f"{torch_prefix}.2", w, b)


def flax_to_torch_state_dict(params: dict) -> dict:
    """Reference-keyed numpy state_dict from a flax VAE param tree
    (``{"encoder": ..., "decoder": ...}``, effective/normalized weights)."""
    sd = {}
    enc, dec = params["encoder"], params["decoder"]

    n_levels = sum(1 for k in enc if k.startswith("enc_block_"))
    for i in range(n_levels):
        _export_stage_seq(sd, enc[f"enc_block_{i}"],
                          f"encoder.encoder_blocks.{i}.module_list.0._seq")
        _export_stage_seq(sd, enc[f"enc_res_{i}"],
                          f"encoder.encoder_residual_blocks.{i}.seq")
        w, b = _linear(enc[f"xs_linear_{i}"]["Dense_0"])
        _put(sd, f"encoder.xs_linear.{i}", w, b)
    w, b = _linear(enc["last_x_linear"]["Dense_0"])
    _put(sd, "encoder.last_x_linear", w, b)

    _export_injector(sd, dec["sequence_start"], "decoder.sequence_start.0")
    n_dec = sum(1 for k in dec if k.startswith("dec_block_"))
    for i in range(n_dec):
        w, b = _convT(dec[f"dec_block_{i}"]["Conv1d_0"])
        _put(sd, f"decoder.decoder_blocks.{i}.module_list.0._seq.0", w, b)
        _export_stage_seq(sd, dec[f"dec_res_{i}"],
                          f"decoder.decoder_residual_blocks.{i}.seq")
    for i in range(n_dec - 1):
        _export_cond_head(sd, dec[f"condition_z_{i}"],
                          f"decoder.condition_z.{i}")
        _export_injector(sd, dec[f"xs_sequence_{i}"],
                         f"decoder.xs_sequence.{i}")
        _export_cond_head(sd, dec[f"condition_xz_{i}"],
                          f"decoder.condition_xz.{i}")

    # fused readout -> recon.0 Conv1d(k=1) + recon.1 GroupNorm
    r = dec["recon"]
    sd["decoder.recon.0.weight"] = _np(r["kernel"]).T[:, :, None]
    sd["decoder.recon.0.bias"] = _np(r["bias"])
    sd["decoder.recon.1.weight"] = _np(r["scale"])
    sd["decoder.recon.1.bias"] = _np(r["norm_bias"])
    return sd


def build_reference_vae(cfg, reference_path: str, state_dict: dict):
    """Instantiate the reference VAE (imported at runtime, never copied),
    load the converted state_dict strictly, return the eval-mode model."""
    import types

    import torch

    # VAE_network imports torchinfo at module level for model summaries this
    # shim never prints; stub it rather than require the package.
    sys.modules.setdefault(
        "torchinfo", types.SimpleNamespace(summary=lambda *a, **k: None))
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from modules.VAE_network import VAE as RefVAE  # noqa: E402

    model = RefVAE(cfg.latent_dim_end, cfg.latent_dim,
                   list(cfg.num_filter_enc), list(cfg.num_filter_dec),
                   cfg.num_node, cfg.num_time, lossfun=cfg.loss_type,
                   batch_size=cfg.batch_size, small=cfg.small)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in state_dict.items()}
    # The reference constructs len(filters)-1 condition/xs-injection heads
    # but its forward only ever uses the first len(filters)-2 (the loop
    # breaks before the last level — decoder.py:170-216, SURVEY's
    # "unused-last-xs quirk").  The rebuild doesn't carry those dead
    # params, so the final head keeps the reference's fresh init; every
    # other key must load.
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    assert not unexpected, unexpected
    n_last = len(cfg.num_filter_dec) - 2
    dead = (f"decoder.xs_sequence.{n_last}.",
            f"decoder.condition_z.{n_last}.",
            f"decoder.condition_xz.{n_last}.")
    leftover = [k for k in missing if not k.startswith(dead)]
    assert not leftover, leftover
    model.eval()
    return model


def main():
    import torch

    from simulgen_vae_tpu.config import (VAEConfig, parse_condition_file,
                                         parse_training_parameters,
                                         read_preset)
    from simulgen_vae_tpu.models.vae import VAE
    from simulgen_vae_tpu.utils.checkpoint import load_flax_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="model_save/SimulGen-VAE",
                    help="flax msgpack written by the CLI (eval params)")
    ap.add_argument("--condition", default="input_data/condition.txt")
    ap.add_argument("--preset_file", default="preset.txt")
    ap.add_argument("--size", default="small", choices=["small", "large"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default="checkpoints/SimulGen-VAE.pth")
    ap.add_argument("--full_model", default=None,
                    help="also torch.save the full pickled reference VAE "
                         "here (needs --reference importable)")
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    config = parse_training_parameters(parse_condition_file(args.condition))
    _, _, filters, _ = read_preset(args.preset_file)
    cfg = VAEConfig.from_condition(config, filters,
                                   small=args.size == "small",
                                   dtype=args.dtype)

    import jax

    model = VAE(latent_dim=cfg.latent_dim_end,
                hierarchical_dim=cfg.latent_dim,
                num_filter_enc=cfg.num_filter_enc,
                num_filter_dec=cfg.num_filter_dec,
                num_node=cfg.num_node, num_time=cfg.num_time,
                lossfun=cfg.loss_type, small=cfg.small)
    x = np.zeros((2, cfg.num_time, cfg.num_node), np.float32)
    key = jax.random.PRNGKey(0)
    template = {"params": model.init({"params": key, "sample": key}, x)
                ["params"]}
    variables = load_flax_model(args.model, template)

    sd = flax_to_torch_state_dict(variables["params"])
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"state_dict ({len(sd)} tensors) -> {args.out}")

    if args.full_model:
        ref_model = build_reference_vae(cfg, args.reference, sd)
        os.makedirs(os.path.dirname(args.full_model) or ".", exist_ok=True)
        torch.save(ref_model, args.full_model)
        print(f"full reference VAE pickle -> {args.full_model}")


if __name__ == "__main__":
    main()
