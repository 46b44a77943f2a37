"""Numerical parity of the flax NWC models vs an independent torch oracle.

Weights are generated in torch, transplanted into the flax param tree, and
outputs compared.  This pins down GroupNorm semantics, exact GELU, conv
padding, flatten ordering, and the hierarchical wiring.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_oracle as oracle


def to_jax(x):
    return jnp.asarray(x.detach().numpy())


def test_conv_block_parity():
    from simulgen_vae_tpu.models.blocks import ConvBlock

    torch.manual_seed(0)
    tblock = oracle.TConvBlock(16, 12, small=True).eval()
    x_t = torch.randn(3, 16, 10)

    conv_p, gn_p = oracle.cgg_params(tblock.seq[0])
    params = {"params": {"Conv1d_0": conv_p, "NormAct_0": gn_p}}

    fblock = ConvBlock(12, small=True)
    out_f = fblock.apply(params, to_jax(x_t).transpose(0, 2, 1))
    out_t = tblock(x_t).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


def test_decoder_residual_block_parity():
    from simulgen_vae_tpu.models.blocks import DecoderResidualBlock

    torch.manual_seed(1)
    tblock = oracle.TDecoderResidual(8, small=True).eval()
    x_t = torch.randn(2, 8, 10)

    params = {"params": {}}
    for j, stage in enumerate(tblock.seq):
        conv_p, gn_p = oracle.cgg_params(stage)
        params["params"][f"Conv1d_{j}"] = conv_p
        params["params"][f"NormAct_{j}"] = gn_p

    fblock = DecoderResidualBlock(8, small=True)
    out_f = fblock.apply(params, to_jax(x_t).transpose(0, 2, 1))
    out_t = tblock(x_t).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-5)


def _encoder_params(tenc, n_levels):
    """Build the flax encoder param tree from the torch oracle encoder."""
    p = {}
    for i in range(n_levels):
        conv_p, gn_p = oracle.cgg_params(tenc.blocks[i].seq[0].seq if False else tenc.blocks[i].seq[0])
        p[f"enc_block_{i}"] = {"Conv1d_0": conv_p, "NormAct_0": gn_p}
        conv_p, gn_p = oracle.cgg_params(tenc.res[i].seq[0])
        p[f"enc_res_{i}"] = {"Conv1d_0": conv_p, "NormAct_0": gn_p}
        p[f"xs_linear_{i}"] = {"Dense_0": oracle.t2f_linear(tenc.xs_linear[i])}
    p["last_x_linear"] = {"Dense_0": oracle.t2f_linear(tenc.last)}
    return p


def test_encoder_parity():
    from simulgen_vae_tpu.models.encoder import Encoder

    torch.manual_seed(2)
    filters = [12, 8, 8]
    tenc = oracle.TEncoder(4, 3, filters, num_node=16, num_time=10).eval()
    x_t = torch.randn(2, 16, 10)

    fenc = Encoder(z_dim=4, hierarchical_dim=3, num_filter_enc=filters,
                   num_time=10, small=True)
    params = {"params": _encoder_params(tenc, len(filters))}

    mu_f, lv_f, xs_f = fenc.apply(params, to_jax(x_t).transpose(0, 2, 1))
    mu_t, lv_t, xs_t = tenc(x_t)

    np.testing.assert_allclose(np.asarray(mu_f), mu_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_f), lv_t.detach().numpy(), atol=1e-5)
    assert len(xs_f) == len(xs_t) == len(filters) - 1
    for hf, ht in zip(xs_f, xs_t):
        np.testing.assert_allclose(np.asarray(hf), ht.detach().numpy(), atol=1e-5)


def _injector_params(tinj):
    conv_p, gn_p = oracle.cgg_params(tinj.conv)
    return {
        "Dense_0": {"Dense_0": oracle.t2f_linear(tinj.lin)},
        "Conv1d_0": conv_p,
        "NormAct_0": gn_p,
    }


def _cond_head_params(thead):
    conv_p, gn_p = oracle.cgg_params(thead.res_seq)
    return {
        "ResidualBlock_0": {"Conv1d_0": conv_p, "NormAct_0": gn_p},
        "Conv1d_0": {"Conv_0": oracle.t2f_conv(thead.out)},
    }


def _decoder_params(tdec, n_filters):
    n = n_filters - 1
    p = {"sequence_start": _injector_params(tdec.seq_start)}
    for i in range(n):
        p[f"dec_block_{i}"] = {
            "Conv1d_0": {"Conv_0": oracle.t2f_conv(tdec.dec_convs[i])}
        }
        res = {}
        for j, stage in enumerate(tdec.dec_res[i].seq):
            conv_p, gn_p = oracle.cgg_params(stage)
            res[f"Conv1d_{j}"] = conv_p
            res[f"NormAct_{j}"] = gn_p
        p[f"dec_res_{i}"] = res
    for i in range(n - 1):
        p[f"condition_z_{i}"] = _cond_head_params(tdec.cond_z[i])
        p[f"xs_sequence_{i}"] = _injector_params(tdec.xs_seq[i])
        p[f"condition_xz_{i}"] = _cond_head_params(tdec.cond_xz[i])
    # fused readout: kernel [F, C] from torch Conv1d [C, F, 1]
    p["recon"] = {
        "kernel": tdec.recon_conv.weight.detach().numpy()[:, :, 0].T,
        "bias": tdec.recon_conv.bias.detach().numpy(),
        "scale": tdec.recon_norm.weight.detach().numpy(),
        "norm_bias": tdec.recon_norm.bias.detach().numpy(),
    }
    return p


def test_decoder_parity_deterministic():
    """Decoder in mode='fix' (std pinned to 1e-8) matches the torch oracle's
    deterministic decode to ~1e-5."""
    from simulgen_vae_tpu.models.decoder import Decoder

    torch.manual_seed(3)
    filters = [8, 8, 12]
    tdec = oracle.TDecoder(4, 3, filters, num_node=16, num_time=10).eval()

    z_t = torch.randn(2, 4)
    xs_t = [torch.randn(2, 3) for _ in range(len(filters) - 2)]

    fdec = Decoder(z_dim=4, hierarchical_dim=3, num_filter_dec=filters,
                   num_node=16, num_time=10, small=True)
    params = {"params": _decoder_params(tdec, len(filters))}

    out_f, kls, _ = fdec.apply(
        params, to_jax(z_t), [to_jax(h) for h in xs_t], mode="fix",
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    out_t = tdec(z_t, xs_t).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=1e-4)
    assert len(kls) == len(filters) - 2


def test_torch_concat_order_matches():
    """cat([xs_sample, decoder_out], dim=channel) ordering is channel-last
    concat in NWC — sanity-check the axis mapping."""
    a = np.random.randn(2, 4, 6)  # [B, C, T]
    b = np.random.randn(2, 5, 6)
    t = torch.cat([torch.tensor(a), torch.tensor(b)], dim=1).numpy()
    j = np.asarray(jnp.concatenate(
        [jnp.asarray(a).transpose(0, 2, 1), jnp.asarray(b).transpose(0, 2, 1)],
        axis=-1,
    )).transpose(0, 2, 1)
    np.testing.assert_allclose(t, j)
