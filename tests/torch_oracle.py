"""Independent torch (CPU) mirror of the reference VAE math, for parity tests.

These modules re-express the documented reference architecture
(SURVEY.md §2.3) in channels-first torch, written from the math — NOT copied —
so the flax NWC implementation can be checked numerically by transplanting
weights.  Layout: torch uses [B, C, T]; flax uses [B, T, C].
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


def groups_for(c: int) -> int:
    g = min(8, max(1, c // 4))
    while c % g != 0:
        g -= 1
    return g


def cgg(in_c, out_c, k):
    """Conv1d -> GroupNorm -> GELU stage."""
    return nn.Sequential(
        nn.Conv1d(in_c, out_c, kernel_size=k, padding=k // 2),
        nn.GroupNorm(groups_for(out_c), out_c),
        nn.GELU(),
    )


class TConvBlock(nn.Module):
    def __init__(self, in_c, out_c, small=True):
        super().__init__()
        layers = [cgg(in_c, out_c, 1)]
        if not small:
            layers.append(cgg(out_c, out_c, 3))
        self.seq = nn.Sequential(*layers)

    def forward(self, x):
        return self.seq(x)


class TEncoderResidual(nn.Module):
    def __init__(self, c, small=True):
        super().__init__()
        reps = 1 if small else 2
        self.seq = nn.Sequential(*[cgg(c, c, 3) for _ in range(reps)])

    def forward(self, x):
        return x + 0.1 * self.seq(x)


class TDecoderResidual(nn.Module):
    def __init__(self, c, small=True):
        super().__init__()
        m = c * 5
        if small:
            self.seq = nn.Sequential(cgg(c, m, 1), cgg(m, m, 5), cgg(m, c, 1))
        else:
            self.seq = nn.Sequential(cgg(c, c, 1), cgg(c, m, 5),
                                     cgg(m, m, 5), cgg(m, c, 1))

    def forward(self, x):
        return x + 0.1 * self.seq(x)


class TEncoder(nn.Module):
    """Mirror of reference Encoder (encoder.py:96-166), small variant."""

    def __init__(self, z_dim, hier_dim, filters, num_node, num_time, small=True):
        super().__init__()
        chans = [num_node] + list(filters)
        self.blocks = nn.ModuleList(
            [TConvBlock(chans[i], chans[i + 1], small) for i in range(len(filters))]
        )
        self.res = nn.ModuleList(
            [TEncoderResidual(f, small) for f in filters]
        )
        self.xs_linear = nn.ModuleList(
            [nn.Linear(f * num_time, hier_dim) for f in filters]
        )
        self.last = nn.Linear(filters[-1] * num_time, 2 * z_dim)
        self.z_dim = z_dim

    def forward(self, x):  # x: [B, num_node, T]
        xs = []
        b = x.shape[0]
        for blk, res, lin in zip(self.blocks, self.res, self.xs_linear):
            x = res(blk(x))
            xs.append(lin(x.reshape(b, -1)))
        last = self.last(x.reshape(b, -1))
        return last[:, : self.z_dim], last[:, self.z_dim:], xs[:-1][::-1]


class TLatentInjector(nn.Module):
    """Linear(h -> h*T) -> unflatten [B,h,T] -> Conv k=5 -> GN -> GELU."""

    def __init__(self, latent, feat, num_time, small=True):
        super().__init__()
        self.lin = nn.Linear(latent, latent * num_time)
        self.latent = latent
        self.num_time = num_time
        self.conv = cgg(latent, feat, 5)

    def forward(self, v):
        h = self.lin(v).reshape(v.shape[0], self.latent, self.num_time)
        return self.conv(h)


class TConditionHead(nn.Module):
    """Residual (k=3 cgg x1 small) -> GELU -> Conv k=3 -> 2*feat channels."""

    def __init__(self, feat, small=True):
        super().__init__()
        self.res_seq = cgg(feat, feat, 3)
        self.out = nn.Conv1d(feat, 2 * feat, kernel_size=3, padding=1)

    def forward(self, x):
        x = x + 0.1 * self.res_seq(x)
        x = torch.nn.functional.gelu(x)
        return self.out(x)


class TDecoder(nn.Module):
    """Mirror of reference Decoder (decoder.py:84-216), small, deterministic
    (mode='fix' with std contribution zeroed for exact comparison)."""

    def __init__(self, z_dim, hier_dim, filters, num_node, num_time, small=True):
        super().__init__()
        self.filters = list(filters)
        n = len(filters) - 1
        self.seq_start = TLatentInjector(z_dim, filters[0], num_time, small)
        self.dec_convs = nn.ModuleList([
            nn.Conv1d(filters[i], filters[i + 1], 3, padding=1)
            for i in range(n)
        ])
        self.dec_res = nn.ModuleList([
            TDecoderResidual(filters[i + 1], small) for i in range(n)
        ])
        self.cond_z = nn.ModuleList([
            TConditionHead(filters[i + 1], small) for i in range(n - 1)
        ])
        self.xs_seq = nn.ModuleList([
            TLatentInjector(hier_dim, filters[i + 1], num_time, small)
            for i in range(n - 1)
        ])
        self.cond_xz = nn.ModuleList([
            TConditionHead2(filters[i + 1], small) for i in range(n - 1)
        ])
        self.recon_conv = nn.Conv1d(filters[-1], num_node, 1)
        self.recon_norm = nn.GroupNorm(groups_for(num_node), num_node)

    def forward(self, z, xs):
        n = len(self.dec_res)
        out = None
        for i in range(n):
            z_sample = self.seq_start(z) if i == 0 else out + z
            out = torch.nn.functional.gelu(self.dec_convs[i](z_sample))
            out = self.dec_res[i](out)
            if i == n - 1:
                break
            mu, log_var = self.cond_z[i](out).chunk(2, dim=1)
            xs_s = self.xs_seq[i](xs[i])
            d_mu, d_lv = self.cond_xz[i](
                torch.cat([xs_s, out], dim=1)
            ).chunk(2, dim=1)
            mu = mu + d_mu
            z = mu  # deterministic: std term dropped for exact parity
        x_hat = torch.tanh(self.recon_norm(self.recon_conv(out)))
        return x_hat


class TConditionHead2(nn.Module):
    """Condition head over concatenated 2*feat input -> 2*feat output."""

    def __init__(self, feat, small=True):
        super().__init__()
        self.res_seq = cgg(2 * feat, 2 * feat, 3)
        self.out = nn.Conv1d(2 * feat, 2 * feat, kernel_size=3, padding=1)

    def forward(self, x):
        x = x + 0.1 * self.res_seq(x)
        x = torch.nn.functional.gelu(x)
        return self.out(x)


# -- weight transplant helpers --------------------------------------------

def t2f_conv(conv: nn.Conv1d):
    """torch Conv1d weight [out,in,k] -> flax kernel [k,in,out]."""
    w = conv.weight.detach().numpy().transpose(2, 1, 0)
    b = conv.bias.detach().numpy()
    return {"kernel": w, "bias": b}


def t2f_linear(lin: nn.Linear):
    w = lin.weight.detach().numpy().T
    b = lin.bias.detach().numpy()
    return {"kernel": w, "bias": b}


def t2f_gn(gn: nn.GroupNorm):
    return {
        "scale": gn.weight.detach().numpy(),
        "bias": gn.bias.detach().numpy(),
    }


def cgg_params(seq):
    """Params for a Conv1d->GN->GELU stage: (Conv1d_i subtree, NormAct_i
    subtree) matching our blocks' param layout."""
    return (
        {"Conv_0": t2f_conv(seq[0])},
        t2f_gn(seq[1]),
    )
