"""Round-trip parity of the torch-artifact export shim.

Converts a randomly initialized flax VAE into the reference's state_dict
layout, loads it STRICTLY into the actual reference ``modules.VAE_network.VAE``
(imported from /root/reference at runtime, never copied), and asserts the
reference model computes the same function: encoder outputs and the
deterministic decode path (mode='fix') — the exact path the reference's
evaluators use (reconstruction_evaluator.py:160-178).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))

from export_torch_state import (build_reference_vae,  # noqa: E402
                                flax_to_torch_state_dict)

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "modules")),
    reason="reference checkout not available",
)


def _make(small):
    from simulgen_vae_tpu.config import VAEConfig
    from simulgen_vae_tpu.models.vae import VAE

    # NB channel counts must keep torch GroupNorm(min(8, C//4), C) valid —
    # the reference cannot construct layers where C isn't divisible by the
    # group count (e.g. 12*5=60 channels -> GroupNorm(8, 60) raises).
    cfg = VAEConfig(num_param=4, num_time=10, num_node=16,
                    latent_dim_end=4, latent_dim=3,
                    num_filter_enc=[16, 8, 8], batch_size=2, small=small)
    model = VAE(latent_dim=cfg.latent_dim_end,
                hierarchical_dim=cfg.latent_dim,
                num_filter_enc=cfg.num_filter_enc,
                num_filter_dec=cfg.num_filter_dec,
                num_node=cfg.num_node, num_time=cfg.num_time,
                lossfun=cfg.loss_type, small=cfg.small)
    key = jax.random.PRNGKey(7)
    x = jnp.zeros((2, cfg.num_time, cfg.num_node))
    params = model.init({"params": key, "sample": key}, x)["params"]
    return cfg, model, params


@pytest.mark.parametrize("small", [True, False])
def test_export_roundtrip_parity(small):
    import torch

    cfg, model, params = _make(small)
    sd = flax_to_torch_state_dict(params)
    ref = build_reference_vae(cfg, REFERENCE, sd)  # strict load asserts keys

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cfg.num_time, cfg.num_node)).astype(
        np.float32) * 0.3

    # encoder parity (torch takes [B, node, time])
    mu_f, lv_f, xs_f = model.apply(
        {"params": params}, jnp.asarray(x),
        method=type(model).encode)
    x_t = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)))
    with torch.no_grad():
        mu_t, lv_t, xs_t = ref.encoder(x_t)
    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv_f), lv_t.numpy(), atol=2e-5)
    for hf, ht in zip(xs_f[:-1][::-1], list(reversed(xs_t[:-1]))):
        np.testing.assert_allclose(np.asarray(hf), ht.numpy(), atol=2e-5)

    # deterministic decode parity (mode='fix': std pinned, eps*1e-8 noise
    # is below the tolerance)
    z = rng.standard_normal((2, cfg.latent_dim_end)).astype(np.float32)
    xs = [rng.standard_normal((2, cfg.latent_dim)).astype(np.float32)
          for _ in range(len(cfg.num_filter_enc) - 2)]
    out_f, _, _ = model.apply(
        {"params": params}, jnp.asarray(z), [jnp.asarray(h) for h in xs],
        mode="fix", method=type(model).decode,
        rngs={"sample": jax.random.PRNGKey(0)})
    with torch.no_grad():
        out_t, _ = ref.decoder(torch.from_numpy(z),
                               [torch.from_numpy(h) for h in xs],
                               mode="fix")
    np.testing.assert_allclose(np.asarray(out_f),
                               out_t.numpy().transpose(0, 2, 1), atol=1e-4)


def test_state_dict_covers_reference_exactly():
    """Strict-load coverage is the contract; spot-check key names too."""
    _, _, params = _make(True)
    sd = flax_to_torch_state_dict(params)
    assert "encoder.encoder_blocks.0.module_list.0._seq.0.weight" in sd
    assert "decoder.recon.1.bias" in sd
    assert "decoder.condition_xz.0.0._seq.0.weight" in sd
    assert sd["decoder.recon.0.weight"].ndim == 3
