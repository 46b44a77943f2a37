"""Fused readout chain: k=1 conv -> GroupNorm -> Tanh -> reconstruction loss.

The decoder readout (reference ``modules/decoder.py:117-121`` + the loss at
``modules/VAE_network.py:100-117``) dominates the flagship step's bandwidth:
the ``[B, T, 95008]`` map is written by the matmul, read for GroupNorm
statistics, read+written for normalize+tanh, and read twice more (with the
target) for the training losses — ~7.2 GB of HBM traffic per step at batch
16 under XLA's schedule.

This op restructures the TRAIN path into two Pallas phases:

  phase 1  (grid C-tiles x batch): y = (h @ W) * inv_sigma + bias, written
           ONCE as bf16, with per-(sample, group) partial statistics
           accumulated in the matmul epilogue — no separate stats pass.
           The W tile is fetched once per C-tile (batch-inner grid order).
  finalize (XLA, tiny): combine partials -> mean / rsqrt(var+eps).
  phase 2  (grid batch x C-tiles): read y once, normalize + tanh in
           registers, reduce BOTH the configured reconstruction loss and
           the always-on MSE monitor against the target — x_hat is NEVER
           materialized (the train step doesn't need it).

Total: ~3.8 GB/step forward.  Backward is a custom VJP in the same
two-phase shape (group-sum partials, then dy tiles) followed by plain XLA
matmuls for dW/dh — dy is the only full-map intermediate it materializes.

Statistics and reductions are f32 on the VPU; the matmul rides the MXU in
bf16 with f32 accumulation, matching the XLA path's ``preferred_element_type``
(parity tests in tests/test_readout_chain.py; hardware probe in
scripts/probe_readout_chain.py).  Group widths need not divide 128 — tiles
cross group boundaries with per-column group ids (the flagship's 11876-wide
groups included).  Spectral norm enters as the scalar ``inv_sigma`` applied
to the matmul output (see models/spectral_norm.compute_sigmas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.ops.groupnorm_gelu import (
    _LANES,
    _expand_group_stats,
    _per_group_scalars,
    _tile_cols,
)

# W tile sized so the (F, CT) bf16 block double-buffers comfortably in VMEM
# alongside the h and y blocks (F=1024 flagship -> 2 MB tiles).
_W_TILE_BYTES = 2 * 1024 * 1024


def _bwd_mode() -> str:
    """Backward flavor: 'fused' contracts dW/dh inside the dy pass (dy
    never materialized, _bwd_fused_dw_kernel); 'materialize' writes the
    [B,T,C] dy map and leaves dW/dh to XLA einsums.  Env
    SIMULGEN_READOUT_BWD overrides; hardware measurements in docs/PERF.md
    ("readout backward fusion, round 5")."""
    import os

    return os.environ.get("SIMULGEN_READOUT_BWD", "fused")


def _elem_loss(o, x, lossfun: str):
    d = o - x
    if lossfun == "MSE":
        return d * d
    ad = jnp.abs(d)
    if lossfun == "MAE":
        return ad
    if lossfun == "smoothL1":       # beta=1.0 (losses.smooth_l1_loss)
        return jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)
    if lossfun == "Huber":          # delta=1.0 (losses.huber_loss)
        return jnp.where(ad < 1.0, 0.5 * ad * ad, ad - 0.5)
    raise ValueError(f"unsupported fused lossfun '{lossfun}'")


def _elem_loss_grad(o, x, lossfun: str):
    """d elem_loss / d o."""
    d = o - x
    if lossfun == "MSE":
        return 2.0 * d
    s = jnp.sign(d)
    if lossfun == "MAE":
        return s
    if lossfun in ("smoothL1", "Huber"):
        return jnp.where(jnp.abs(d) < 1.0, d, s)
    raise ValueError(lossfun)


def _tile_width(f: int, c: int, t: int = 200) -> int:
    """C-tile width: bounded by the W-tile budget AND by the kernel bodies'
    f32 temporaries (~6 live [T, CT] arrays in _bwd_common / the loss
    epilogue), which live in scoped VMEM (16 MB limit).  At small F the
    W-tile rule alone explodes — f=128 gave ct=8192, whose [200, 8192] f32
    temps OOM the scoped allocator (observed on v5e, round 5)."""
    ct = max((_W_TILE_BYTES // (2 * f)) // _LANES * _LANES, _LANES)
    ct_tmp = max(int(10e6) // (6 * 4 * max(t, 1)) // _LANES * _LANES,
                 _LANES)
    return min(ct, ct_tmp, -(-c // _LANES) * _LANES)


# -- forward kernels ---------------------------------------------------------

def _matmul_stats_kernel(h_ref, w_ref, bias_ref, inv_ref, y_ref, part_ref, *,
                         num_groups, c_total, ct):
    import jax.experimental.pallas as pl

    h = h_ref[0]                                           # [T, F] bf16
    w = w_ref[...]                                         # [F, CT]
    yr = jnp.dot(h, w, preferred_element_type=jnp.float32)  # MXU, f32 accum
    ys = yr * inv_ref[0, 0] + bias_ref[0].astype(jnp.float32)
    y_bf = ys.astype(y_ref.dtype)
    y_ref[0] = y_bf

    # statistics of the ROUNDED stored y (bit-matches the XLA reference,
    # which casts the matmul output to compute dtype before GroupNorm)
    _, valid, col_group = _tile_cols(pl.program_id(0), ct, c_total,
                                     c_total // num_groups)
    yf = jnp.where(valid, y_bf.astype(jnp.float32), 0.0)
    rowsum = jnp.sum(yf, axis=0, keepdims=True)
    rowsq = jnp.sum(yf * yf, axis=0, keepdims=True)
    part_ref[0, 0] = jnp.concatenate(
        [_per_group_scalars(rowsum, col_group, num_groups),
         _per_group_scalars(rowsq, col_group, num_groups)], axis=0)


def _loss_kernel(y_ref, x_ref, scale_ref, nb_ref, stats_ref, out_ref, *,
                 num_groups, c_total, ct, lossfun):
    import jax.experimental.pallas as pl

    _, valid, col_group = _tile_cols(pl.program_id(1), ct, c_total,
                                     c_total // num_groups)
    y = jnp.where(valid, y_ref[0].astype(jnp.float32), 0.0)
    x = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
    mean_c, inv_c = _expand_group_stats(stats_ref[0], col_group, num_groups)

    xn = (y - mean_c) * inv_c
    o = jnp.tanh(xn * scale_ref[0].astype(jnp.float32)
                 + nb_ref[0].astype(jnp.float32))
    o = jnp.where(valid, o, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    lsum = jnp.sum(jnp.where(valid, _elem_loss(o, x, lossfun), 0.0))
    msum = jnp.sum(jnp.where(valid, (o - x) ** 2, 0.0))
    out_ref[0, 0] = jnp.concatenate(
        [jnp.where(lane == 0, lsum, 0.0),
         jnp.where(lane == 0, msum, 0.0)], axis=0)


def _fused_bwd_tile(b: int, t: int, f: int, ct: int):
    """C-tile width for the fused backward, or None when it cannot engage.

    The fused backward keeps the FULL [B, T, F] f32 dh accumulator resident
    in VMEM for the whole kernel, alongside the streamed y/x/W/dW tiles;
    shrink the C-tile until the budget fits (x1.7 covers Mosaic's input
    double buffering).  At flagship train geometry (B=16, T=200, F=1024 ->
    26 MB of dh alone) no tile width fits, so the backward falls back to
    the materializing path.

    v5e measurements (scripts/probe_readout_chain.py, round 5) also rule
    out NARROW tiles: at B=4 x F=1024 -> C=95008 the VMEM budget forces
    ctf=256 and the fused backward LOSES (14.2 vs 11.1 ms fwd+bwd) — the
    per-tile W refetch and dh read-modify-write overwhelm the saved dy
    round trip — while at F=128 -> C=5120 (ctf=2048) it WINS (4.84 vs
    5.53 ms).  Hence the engage rule: fused only when a >=1024-wide
    C-tile fits."""
    ctf = min(ct, 2048)

    def need(w: int) -> float:
        return (4 * b * t * f + 6 * f * w + 8 * t * w + 2 * t * f) * 1.7

    while ctf > _LANES and need(ctf) > 11e6:
        ctf = max(ctf // 2 // _LANES * _LANES, _LANES)
    return ctf if need(ctf) <= 11e6 and ctf >= 1024 else None


def bwd_flavor(b: int, t: int, f: int, c: int) -> str:
    """Which backward a given geometry will actually run (probe/docs aid)."""
    if _bwd_mode() != "fused":
        return "materialize"
    ct = _tile_width(f, c, t)
    return "fused" if _fused_bwd_tile(b, t, f, ct) is not None else \
        "materialize (vmem fallback)"


# -- backward kernels --------------------------------------------------------

def _bwd_common(y_ref, x_ref, scale_ref, nb_ref, stats_ref, tile_idx, *,
                num_groups, c_total, ct, lossfun, gl, gm, n_elem):
    """Recompute xn, o, da for one tile (shared by both backward phases)."""
    _, valid, col_group = _tile_cols(tile_idx, ct, c_total,
                                     c_total // num_groups)
    y = jnp.where(valid, y_ref[0].astype(jnp.float32), 0.0)
    x = jnp.where(valid, x_ref[0].astype(jnp.float32), 0.0)
    mean_c, inv_c = _expand_group_stats(stats_ref[0], col_group, num_groups)
    xn = (y - mean_c) * inv_c
    scale32 = jnp.where(valid[0], scale_ref[0].astype(jnp.float32), 0.0)
    o = jnp.tanh(xn * scale32 + nb_ref[0].astype(jnp.float32))
    dl_do = (gl * _elem_loss_grad(o, x, lossfun) + gm * 2.0 * (o - x)) / n_elem
    da = jnp.where(valid, dl_do * (1.0 - o * o), 0.0)
    return xn, da, scale32, inv_c, col_group, valid


def _bwd_stats_kernel(y_ref, x_ref, scale_ref, nb_ref, stats_ref, g_ref,
                      gsums_ref, dscale_ref, dnb_ref, *, num_groups, c_total,
                      ct, lossfun, n_elem):
    import jax.experimental.pallas as pl

    gl = g_ref[0, 0]
    gm = g_ref[0, 1]
    xn, da, scale32, _, col_group, _ = _bwd_common(
        y_ref, x_ref, scale_ref, nb_ref, stats_ref, pl.program_id(1),
        num_groups=num_groups, c_total=c_total, ct=ct, lossfun=lossfun,
        gl=gl, gm=gm, n_elem=n_elem)

    dnb_ref[0, 0, 0] = jnp.sum(da, axis=0)
    dscale_ref[0, 0, 0] = jnp.sum(da * xn, axis=0)

    dxn = da * scale32
    dxn_sum = jnp.sum(dxn, axis=0, keepdims=True)
    dxnxn_sum = jnp.sum(dxn * xn, axis=0, keepdims=True)
    gsums_ref[0, 0] = jnp.concatenate(
        [_per_group_scalars(dxn_sum, col_group, num_groups),
         _per_group_scalars(dxnxn_sum, col_group, num_groups)], axis=0)


def _bwd_fused_dw_kernel(y_ref, x_ref, scale_ref, nb_ref, bias_ref, h_ref,
                         w_ref, stats_ref, msums_ref, g_ref,
                         dw_ref, dh_ref, dbias_ref, dinv_ref, *,
                         num_groups, c_total, ct, lossfun, n_elem):
    """Phase 2 WITHOUT materializing dy (round-5 backward-side fusion,
    VERDICT r4 item 7): recompute dy for one (C-tile, sample) block in
    registers and immediately contract it into BOTH weight-side gradients —

      dW[F, CT]  += h[i].T @ dy        (accumulated over samples; the dW
                                        tile block stays resident per C-tile
                                        since the batch is the inner grid)
      dh[i, T, F] += dy @ W_tile.T     (accumulated over C-tiles into ONE
                                        resident [B, T, F] f32 block — 1.6 MB
                                        at flagship geometry — written once
                                        when the kernel retires)

    plus the dbias / d inv_sigma reductions that rode the old dy pass.  The
    [B, T, C] dy map (608 MB bf16 at flagship) is never written or re-read:
    vs the materializing path this removes one full-map write + two reads
    (~1.8 GB/step) at the cost of re-fetching the small h blocks per C-tile
    (B*nt*T*F*2 ≈ 38 MB).  Both matmuls ride the MXU in bf16 with f32
    accumulation — exactly the dtypes of the XLA einsums they replace."""
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    i = pl.program_id(1)
    gl = g_ref[0, 0]
    gm = g_ref[0, 1]
    inv_sigma = g_ref[0, 2]
    xn, da, scale32, inv_c, col_group, valid = _bwd_common(
        y_ref, x_ref, scale_ref, nb_ref, stats_ref, j,
        num_groups=num_groups, c_total=c_total, ct=ct, lossfun=lossfun,
        gl=gl, gm=gm, n_elem=n_elem)
    m1_c, m2_c = _expand_group_stats(msums_ref[0], col_group, num_groups)
    dy = (da * scale32 - m1_c - xn * m2_c) * inv_c
    dy = jnp.where(valid, dy, 0.0)                        # [T, CT] f32

    dy_lo = dy.astype(h_ref.dtype)
    h = h_ref[0]                                          # [T, F]
    dw_tile = jax.lax.dot_general(                        # [F, CT]
        h, dy_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # mask the padded W columns: dy is 0 there, but 0 * garbage (NaN in
    # interpret mode) would still poison the contraction
    w = jnp.where(valid[0][None, :], w_ref[...], 0)
    dh_tile = jax.lax.dot_general(                        # [T, F]
        dy_lo, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_tile = jnp.sum(dy, axis=0, keepdims=True)          # [1, CT]

    y = jnp.where(valid, y_ref[0].astype(jnp.float32), 0.0)
    yr = (y - jnp.where(valid[0], bias_ref[0].astype(jnp.float32), 0.0)) \
        / inv_sigma
    # dinv partial lives in a (1, 8, LANES) block (Mosaic requires the last
    # two block dims divisible by (8, 128)); only [0, 0, 0] is nonzero.
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, _LANES), 2)
    dinv_tile = jnp.where((sub == 0) & (lane == 0), jnp.sum(dy * yr), 0.0)

    @pl.when(i == 0)
    def _init_tile():
        dw_ref[...] = dw_tile
        dbias_ref[...] = db_tile
        dinv_ref[...] = dinv_tile

    @pl.when(i > 0)
    def _acc_tile():
        dw_ref[...] += dw_tile
        dbias_ref[...] += db_tile
        dinv_ref[...] += dinv_tile

    @pl.when(j == 0)
    def _init_dh():
        dh_ref[pl.ds(i, 1)] = dh_tile[None]

    @pl.when(j > 0)
    def _acc_dh():
        dh_ref[pl.ds(i, 1)] += dh_tile[None]


def _bwd_dy_kernel(y_ref, x_ref, scale_ref, nb_ref, bias_ref, stats_ref,
                   msums_ref, g_ref, dy_ref, dbias_ref, dinv_ref, *,
                   num_groups, c_total, ct, lossfun, n_elem):
    import jax.experimental.pallas as pl

    gl = g_ref[0, 0]
    gm = g_ref[0, 1]
    inv_sigma = g_ref[0, 2]
    xn, da, scale32, inv_c, col_group, valid = _bwd_common(
        y_ref, x_ref, scale_ref, nb_ref, stats_ref, pl.program_id(1),
        num_groups=num_groups, c_total=c_total, ct=ct, lossfun=lossfun,
        gl=gl, gm=gm, n_elem=n_elem)
    m1_c, m2_c = _expand_group_stats(msums_ref[0], col_group, num_groups)

    dy = (da * scale32 - m1_c - xn * m2_c) * inv_c
    dy_ref[0] = dy.astype(dy_ref.dtype)
    dbias_ref[0, 0, 0] = jnp.sum(dy, axis=0)

    # d/d inv_sigma partial: sum(dy * yr), yr = (y - bias)/inv recomputed
    y = jnp.where(valid, y_ref[0].astype(jnp.float32), 0.0)
    yr = (y - jnp.where(valid[0], bias_ref[0].astype(jnp.float32), 0.0)) \
        / inv_sigma
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    dinv_ref[0, 0] = jnp.where(lane == 0,
                               jnp.sum(jnp.where(valid, dy * yr, 0.0)), 0.0)


# -- host-side assembly -------------------------------------------------------

def _forward_parts(h, kernel, bias, scale, norm_bias, x_target, inv_sigma,
                   num_groups, eps, lossfun):
    from jax.experimental import pallas as pl

    b, t, f = h.shape
    c = kernel.shape[-1]
    ct = _tile_width(f, c, t)
    nt = -(-c // ct)
    interpret = jax.default_backend() != "tpu"
    dtype = h.dtype

    inv = jnp.asarray(inv_sigma, jnp.float32).reshape(1, 1)
    kern = kernel.astype(dtype)
    bias2 = bias.reshape(1, -1)

    y, partials = pl.pallas_call(
        functools.partial(_matmul_stats_kernel, num_groups=num_groups,
                          c_total=c, ct=ct),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), dtype),
            jax.ShapeDtypeStruct((b, nt, 2, _LANES), jnp.float32),
        ),
        grid=(nt, b),  # C-tile OUTER: the W tile is fetched once per tile
        in_specs=[
            pl.BlockSpec((1, t, f), lambda j, i: (i, 0, 0)),
            pl.BlockSpec((f, ct), lambda j, i: (0, j)),
            pl.BlockSpec((1, ct), lambda j, i: (0, j)),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, t, ct), lambda j, i: (i, 0, j)),
            pl.BlockSpec((1, 1, 2, _LANES), lambda j, i: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(h, kern, bias2, inv)

    sums = jnp.sum(partials, axis=1)
    denom = float(t * (c // num_groups))
    mean = sums[:, 0] / denom
    var = sums[:, 1] / denom - mean * mean
    inv_std = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    stats = jnp.stack([mean, inv_std], axis=1)            # [B, 2, 128]

    loss_parts = pl.pallas_call(
        functools.partial(_loss_kernel, num_groups=num_groups, c_total=c,
                          ct=ct, lossfun=lossfun),
        out_shape=jax.ShapeDtypeStruct((b, nt, 2, _LANES), jnp.float32),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, _LANES), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(y, x_target.astype(dtype), scale.reshape(1, -1),
      norm_bias.reshape(1, -1), stats)

    n_elem = float(b * t * c)
    loss = jnp.sum(loss_parts[:, :, 0, 0]) / n_elem
    mse = jnp.sum(loss_parts[:, :, 1, 0]) / n_elem
    return loss, mse, y, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def readout_chain_loss(h, kernel, bias, scale, norm_bias, x_target,
                       inv_sigma, num_groups: int, eps: float = 1e-5,
                       lossfun: str = "MSE"):
    """Fused train-path readout: returns ``(recon_loss, recon_mse)`` means
    without materializing x_hat.  ``inv_sigma`` is the spectral-norm output
    scale (pass 1.0 when SN is off)."""
    loss, mse, _, _ = _forward_parts(h, kernel, bias, scale, norm_bias,
                                     x_target, inv_sigma, num_groups, eps,
                                     lossfun)
    return loss, mse


def _fwd(h, kernel, bias, scale, norm_bias, x_target, inv_sigma,
         num_groups, eps, lossfun):
    loss, mse, y, stats = _forward_parts(h, kernel, bias, scale, norm_bias,
                                         x_target, inv_sigma, num_groups,
                                         eps, lossfun)
    return (loss, mse), (h, kernel, bias, scale, norm_bias, x_target,
                         inv_sigma, y, stats)


def _bwd(num_groups, eps, lossfun, residuals, cotangents):
    from jax.experimental import pallas as pl

    (h, kernel, bias, scale, norm_bias, x_target, inv_sigma, y,
     stats) = residuals
    gl, gm = cotangents
    b, t, f = h.shape
    c = kernel.shape[-1]
    ct = _tile_width(f, c, t)
    nt = -(-c // ct)
    n_elem = float(b * t * c)
    interpret = jax.default_backend() != "tpu"
    dtype = h.dtype

    inv = jnp.asarray(inv_sigma, jnp.float32)
    g2 = jnp.stack([jnp.asarray(gl, jnp.float32),
                    jnp.asarray(gm, jnp.float32),
                    inv, jnp.zeros((), jnp.float32)]).reshape(1, 4)
    scale2 = scale.reshape(1, -1)
    nb2 = norm_bias.reshape(1, -1)
    xt = x_target.astype(dtype)
    kw = dict(num_groups=num_groups, c_total=c, ct=ct, lossfun=lossfun,
              n_elem=n_elem)

    gsums, dscale_p, dnb_p = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((b, nt, 2, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, ct), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, ct), jnp.float32),
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 2, _LANES), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ct), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, ct), lambda i, j: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(y, xt, scale2, nb2, stats, g2)

    denom = float(t * (c // num_groups))
    msums = jnp.sum(gsums, axis=1) / denom                # [B, 2, 128]

    dscale = jnp.sum(dscale_p.reshape(b, nt * ct)[:, :c], axis=0)
    dnb = jnp.sum(dnb_p.reshape(b, nt * ct)[:, :c], axis=0)

    ctf = _fused_bwd_tile(b, t, f, ct)
    if _bwd_mode() == "fused" and ctf is not None:
        # dW/dh contracted inside the dy pass — dy never materialized
        # (docstring of _bwd_fused_dw_kernel).
        ntf = -(-c // ctf)
        kwf = dict(kw, ct=ctf)
        dw_p, dh_p, dbias_p2, dinv_p2 = pl.pallas_call(
            functools.partial(_bwd_fused_dw_kernel, **kwf),
            out_shape=(
                jax.ShapeDtypeStruct((f, ntf * ctf), jnp.float32),
                jax.ShapeDtypeStruct((b, t, f), jnp.float32),
                jax.ShapeDtypeStruct((1, ntf * ctf), jnp.float32),
                jax.ShapeDtypeStruct((ntf, 8, _LANES), jnp.float32),
            ),
            grid=(ntf, b),  # C-tile OUTER: dW/dbias blocks accumulate
            in_specs=[
                pl.BlockSpec((1, t, ctf), lambda j, i: (i, 0, j)),
                pl.BlockSpec((1, t, ctf), lambda j, i: (i, 0, j)),
                pl.BlockSpec((1, ctf), lambda j, i: (0, j)),
                pl.BlockSpec((1, ctf), lambda j, i: (0, j)),
                pl.BlockSpec((1, ctf), lambda j, i: (0, j)),
                pl.BlockSpec((1, t, f), lambda j, i: (i, 0, 0)),
                pl.BlockSpec((f, ctf), lambda j, i: (0, j)),
                pl.BlockSpec((1, 2, _LANES), lambda j, i: (i, 0, 0)),
                pl.BlockSpec((1, 2, _LANES), lambda j, i: (i, 0, 0)),
                pl.BlockSpec((1, 4), lambda j, i: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((f, ctf), lambda j, i: (0, j)),
                pl.BlockSpec((b, t, f), lambda j, i: (0, 0, 0)),
                pl.BlockSpec((1, ctf), lambda j, i: (0, j)),
                pl.BlockSpec((1, 8, _LANES), lambda j, i: (j, 0, 0)),
            ),
            interpret=interpret,
        )(y, xt, scale2, nb2, bias.reshape(1, -1), h.astype(dtype),
          kernel.astype(dtype), stats, msums, g2)
        dW = dw_p[:, :c] * inv
        dh = (dh_p * inv).astype(dtype)
        dbias = dbias_p2[0, :c]
        dinv = jnp.sum(dinv_p2[:, 0, 0])
        return (dh, dW.astype(kernel.dtype), dbias.astype(bias.dtype),
                dscale.astype(scale.dtype), dnb.astype(norm_bias.dtype),
                jnp.zeros_like(x_target), dinv.astype(jnp.float32))

    dy, dbias_p, dinv_p = pl.pallas_call(
        functools.partial(_bwd_dy_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), dtype),
            jax.ShapeDtypeStruct((b, nt, 1, ct), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, _LANES), jnp.float32),
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, ct), lambda i, j: (0, j)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 2, _LANES), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, t, ct), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, 1, ct), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, _LANES), lambda i, j: (i, j, 0, 0)),
        ),
        interpret=interpret,
    )(y, xt, scale2, nb2, bias.reshape(1, -1), stats, msums, g2)

    # dy is w.r.t. ys = yr*inv + bias; fold inv into the matmul OUTPUTS
    # (scalar multiply of [F,C] / [B,T,F], not of the full [B,T,C] map)
    dW = jnp.einsum("btf,btc->fc", h, dy,
                    preferred_element_type=jnp.float32) * inv
    dh = (jnp.einsum("btc,fc->btf", dy, kernel.astype(dtype),
                     preferred_element_type=jnp.float32) * inv).astype(dtype)
    dbias = jnp.sum(dbias_p.reshape(b, nt * ct)[:, :c], axis=0)
    dinv = jnp.sum(dinv_p[:, :, 0, 0])

    return (dh, dW.astype(kernel.dtype), dbias.astype(bias.dtype),
            dscale.astype(scale.dtype), dnb.astype(norm_bias.dtype),
            jnp.zeros_like(x_target), dinv.astype(jnp.float32))


readout_chain_loss.defvjp(_fwd, _bwd)


def readout_chain_loss_reference(h, kernel, bias, scale, norm_bias, x_target,
                                 inv_sigma, num_groups: int,
                                 eps: float = 1e-5, lossfun: str = "MSE"):
    """XLA reference composition (same math as FusedPointwiseNormTanh +
    losses.*) for parity tests."""
    from simulgen_vae_tpu.ops.groupnorm_gelu import group_norm_gelu_reference

    y = jnp.einsum("btf,fc->btc", h, kernel.astype(h.dtype),
                   preferred_element_type=jnp.float32)
    y = y * jnp.asarray(inv_sigma, jnp.float32)
    y = (y + bias.astype(jnp.float32)).astype(h.dtype)
    o = group_norm_gelu_reference(y, scale, norm_bias, num_groups, eps,
                                  act="tanh").astype(jnp.float32)
    x32 = x_target.astype(jnp.float32)
    loss = jnp.mean(_elem_loss(o, x32, lossfun))
    mse = jnp.mean((o - x32) ** 2)
    return loss, mse
