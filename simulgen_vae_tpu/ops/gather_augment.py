"""Fused batch-assembly kernel: row gather + mixup + noise in one HBM pass.

Motivation (docs/PERF.md round 3): the jitted train step assembles each
batch with two 16-row gathers from the HBM-resident dataset
(``jnp.take(data, idx)`` for the batch, another for the mixup partner —
``vae_trainer.py``) followed by the elementwise augmentation
(``data/augmentation.py``).  XLA lowers this as gather kernels feeding a
fusion; the round-2 trace put the gathers at ~107-214 GB/s effective —
far off the v5e HBM roofline — because the fused gather degenerates to
per-element index arithmetic instead of bulk row DMAs.

This Pallas kernel does the whole assembly in ONE pass at the DMA rate:
for each (sample, node-tile) grid cell it DMAs the batch row tile and the
partner row tile (row indices via scalar prefetch), generates the
Gaussian noise in-register (on-core PRNG + Box-Muller — the noise array
never touches HBM), applies noise -> amplitude scale -> mixup, and writes
the finished tile.  Traffic is the information-theoretic floor: read
batch rows + read partner rows + write output.

Reference behavior being reproduced (composition order and semantics):
``/root/reference/modules/augmentation.py:43-139`` — Gaussian noise
(p=.5, sigma=.05), amplitude scaling (p=.5, U[0.9,1.1]), mixup (p=.5,
Beta(.2,.2) clamped to [.1,.9], partner drawn from the whole dataset).
Per-sample Bernoulli draws and mixup/scale coefficients are folded into
three effective per-sample scalars computed by the caller with the
normal jax PRNG (tiny, [batch]-shaped):

  ``x   = (row + n * noise_sd[i]) * amp[i]``        (n ~ N(0,1) in-kernel)
  ``out = lam[i] * x + (1 - lam[i]) * partner_row``

with ``noise_sd[i] in {0, level}``, ``amp[i] in {1, U[lo,hi]}``,
``lam[i] in {1, clip(Beta, .1, .9)}`` — exactly the distributions of the
sequential composition in ``augment_batch``.

The only stochastic element inside the kernel is the per-element standard
normal, generated from ``pltpu.prng_random_bits`` via Box-Muller.  Its
stream differs from ``jax.random.normal`` (as the RBG fast-path already
does in the trainer); distribution tests cover it
(``tests/test_gather_augment.py``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _kernel(idx_ref, pidx_ref, seed_ref, lam_ref, amp_ref, sd_ref,
            row_ref, partner_ref, out_ref, *, with_noise: bool):
    i = pl.program_id(0)

    x = row_ref[0].astype(jnp.float32)        # (T, tile_n)
    p = partner_ref[0].astype(jnp.float32)

    sd = sd_ref[i]
    amp = amp_ref[i]
    lam = lam_ref[i]

    if with_noise:
        # The noise path is the kernel's VPU cost (round-3 probe: the
        # transcendentals, not the DMAs, bound the original version at
        # ~12.4 ms).  Two measures: (a) Box-Muller's sin AND cos halves
        # the log/sqrt count — draw uniforms for half the tile, emit
        # (r·cos, r·sin); (b) the whole block is skipped via lax.cond for
        # the ~half of samples whose per-sample noise draw is off
        # (sd == 0), so its expected cost halves again.
        def _add_noise(v):
            # Unique PRNG stream per grid cell; seed_ref[0] varies per
            # call.  (prng_seed has no CPU interpret lowering, hence the
            # static with_noise gate — deterministic math is CPU-tested,
            # the noise path TPU-probed.)
            j = pl.program_id(1)
            pltpu.prng_seed(seed_ref[0] + i * pl.num_programs(1) + j)
            half = (v.shape[1] // 2 + 127) // 128 * 128
            shape = (v.shape[0], half)
            b1 = pltpu.prng_random_bits(shape)
            b2 = pltpu.prng_random_bits(shape)
            # uint32 -> f32 has no Mosaic cast; shift to 24 bits (always
            # non-negative) and go through int32.  u1 in (0,1] (log
            # finite); u2 in [0,1).
            u1 = pltpu.bitcast(pltpu.bitcast(b1, jnp.uint32) >> 8,
                               jnp.int32).astype(jnp.float32)
            u2 = pltpu.bitcast(pltpu.bitcast(b2, jnp.uint32) >> 8,
                               jnp.int32).astype(jnp.float32)
            inv = jnp.float32(1.0 / (1 << 24))
            u1 = (u1 + 1.0) * inv
            u2 = u2 * inv
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            th = jnp.float32(_TWO_PI) * u2
            n = jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)],
                                axis=1)[:, : v.shape[1]]
            return v + n * sd

        x = jax.lax.cond(sd > 0.0, _add_noise, lambda v: v, x)

    out = lam * (x * amp) + (1.0 - lam) * p
    out_ref[0] = out.astype(out_ref.dtype)


def default_tile_n(t: int, itemsize: int) -> int:
    """Largest 128-multiple node tile fitting the 16 MB scoped-VMEM budget.

    Measured footprint is ~10.7x the input block bytes (row + partner + out
    blocks double-buffered, plus the f32 working copies and noise
    temporaries): f32 T=200 tile=2048 compiles to a 17.14 MB stack — over
    the limit — while bf16 at the same tile fits.  Target 12 MB to leave
    headroom, cap at the bf16-tuned 2048 (larger tiles measured flat,
    docs/PERF.md).
    """
    tile = int(12e6 / (10.7 * t * itemsize)) // 128 * 128
    return max(min(tile, 2048), 256)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "interpret", "with_noise"))
def gather_augment(data: jax.Array, idx: jax.Array, pidx: jax.Array,
                   seed: jax.Array, lam_eff: jax.Array, amp: jax.Array,
                   noise_sd: jax.Array, *, tile_n: int = 0,
                   interpret: bool = False,
                   with_noise: bool = True) -> jax.Array:
    """Gather ``data[idx]`` and ``data[pidx]`` and fuse the augmentation.

    Args:
      data: ``[n, T, N]`` device-resident dataset (any float dtype).
      idx: ``[b]`` int32 batch row indices.
      pidx: ``[b]`` int32 mixup-partner row indices.
      seed: int32 scalar; per-call PRNG seed for the in-kernel noise.
      lam_eff: ``[b]`` f32 mixup weights (1.0 = no mixup for that sample).
      amp: ``[b]`` f32 amplitude scales (1.0 = no scaling).
      noise_sd: ``[b]`` f32 noise stddevs (0.0 = no noise).

    Returns:
      ``[b, T, N]`` augmented batch, ``data.dtype``.
    """
    n, t, nodes = data.shape
    b = idx.shape[0]
    if not tile_n:  # 0 = auto (dtype/VMEM-aware)
        tile_n = default_tile_n(t, jnp.dtype(data.dtype).itemsize)
    grid = (b, pl.cdiv(nodes, tile_n))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, tile_n),
                         lambda i, j, idx, pidx, *_: (idx[i], 0, j)),
            pl.BlockSpec((1, t, tile_n),
                         lambda i, j, idx, pidx, *_: (pidx[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((1, t, tile_n),
                               lambda i, j, *_: (i, 0, j)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, with_noise=with_noise),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, nodes), data.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), pidx.astype(jnp.int32),
      jnp.asarray(seed, jnp.int32).reshape(1),
      lam_eff.astype(jnp.float32), amp.astype(jnp.float32),
      noise_sd.astype(jnp.float32), data, data)


def gather_augment_sharded(mesh, data: jax.Array, idx: jax.Array,
                           pidx: jax.Array, seed: jax.Array,
                           lam_eff: jax.Array, amp: jax.Array,
                           noise_sd: jax.Array, *, tile_n: int = 0,
                           interpret: bool = False,
                           with_noise: bool = True) -> jax.Array:
    """Mesh-parallel fused assembly: :func:`gather_augment` under shard_map.

    ``pl.pallas_call`` has no GSPMD partitioning rule, so mesh runs fell
    back to the XLA gather+augment chain (docs/PERF.md round 3).  This
    wrapper recovers the fused path on a ``(data, model)`` mesh by running
    the kernel per-device under ``jax.shard_map``:

    * ``data`` must be laid out ``P(None, None, "model")`` — sample rows
      REPLICATED across the data axis, nodes sharded over ``model``.  That
      is the layout the row-gather needs (any device may draw any sample as
      batch row or mixup partner); node-sharding keeps the per-device
      working set at ``1/model_axis``.  It costs ``data_axis``× dataset HBM
      vs the row-sharded resident layout — callers with datasets too big
      for that use the streaming path instead (``train_epoch_streaming``).
    * ``idx``/``pidx`` and the per-sample scalars shard over ``data``: each
      data-group assembles only its sub-batch.
    * output lands ``P("data", None, "model")`` — exactly the activation
      sharding the train step wants (``parallel/sharding.batch_sharding``),
      so no reshard follows.

    Per-device noise streams are decorrelated by folding the device's mesh
    coordinates into the seed (the in-kernel stream already varies per
    grid cell).  Requires ``b % data_axis == 0`` and
    ``nodes % model_axis == 0``; callers fall back to XLA otherwise.
    """
    from jax.sharding import PartitionSpec as P

    d_ax, m_ax = mesh.shape["data"], mesh.shape["model"]
    b = idx.shape[0]
    nodes = data.shape[-1]
    if b % d_ax or nodes % m_ax:
        raise ValueError(
            f"gather_augment_sharded needs b%data==0 and nodes%model==0, "
            f"got b={b}, nodes={nodes}, mesh={dict(mesh.shape)}")
    if not tile_n:
        tile_n = default_tile_n(data.shape[1],
                                jnp.dtype(data.dtype).itemsize)
    local_tile = min(tile_n, nodes // m_ax)

    def body(data_l, idx_l, pidx_l, seed_l, lam_l, amp_l, sd_l):
        di = jax.lax.axis_index("data")
        mi = jax.lax.axis_index("model")
        # Large odd stride keeps per-device seed blocks disjoint from the
        # per-grid-cell offsets added inside the kernel.
        seed_dev = seed_l + (di * m_ax + mi) * jnp.int32(0x9E3779B)
        return gather_augment(data_l, idx_l, pidx_l, seed_dev, lam_l,
                              amp_l, sd_l, tile_n=local_tile,
                              interpret=interpret, with_noise=with_noise)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "model"), P("data"), P("data"), P(),
                  P("data"), P("data"), P("data")),
        out_specs=P("data", None, "model"),
        check_vma=False,
    )
    return fn(data, idx.astype(jnp.int32), pidx.astype(jnp.int32),
              jnp.asarray(seed, jnp.int32), lam_eff.astype(jnp.float32),
              amp.astype(jnp.float32), noise_sd.astype(jnp.float32))


def dataset_replicated_rows_sharding(mesh, shape=None):
    """Sharding for a resident dataset feeding :func:`gather_augment_sharded`:
    rows replicated over ``data``, nodes over ``model`` (see its docstring).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    node_ok = shape is None or shape[-1] % mesh.shape["model"] == 0
    return NamedSharding(mesh, P(None, None, "model" if node_ok else None))


def draw_augment_scalars(key: jax.Array, b: int,
                         noise_prob: float = 0.5, noise_level: float = 0.05,
                         scaling_prob: float = 0.5,
                         scaling_range: Tuple[float, float] = (0.9, 1.1),
                         mixup_prob: float = 0.5, mixup_alpha: float = 0.2,
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-sample effective scalars matching ``augment_batch``'s draws.

    Returns ``(lam_eff, amp, noise_sd)``, each ``[b]`` f32, with exactly
    the distributions of the sequential composition in
    ``data/augmentation.py`` (reference ``modules/augmentation.py:43-139``).
    """
    k_np, k_sp, k_s, k_mp, k_m = jax.random.split(key, 5)
    noise_on = jax.random.uniform(k_np, (b,)) < noise_prob
    noise_sd = jnp.where(noise_on, noise_level, 0.0).astype(jnp.float32)

    lo, hi = scaling_range
    scale = jax.random.uniform(k_s, (b,), jnp.float32, lo, hi)
    scale_on = jax.random.uniform(k_sp, (b,)) < scaling_prob
    amp = jnp.where(scale_on, scale, 1.0)

    lam = jnp.clip(jax.random.beta(k_m, mixup_alpha, mixup_alpha, (b,)),
                   0.1, 0.9).astype(jnp.float32)
    mix_on = jax.random.uniform(k_mp, (b,)) < mixup_prob
    lam_eff = jnp.where(mix_on, lam, 1.0)
    return lam_eff, amp, noise_sd


def gather_augment_reference(data, idx, pidx, normal_noise, lam_eff, amp,
                             noise_sd):
    """jnp composition oracle (same math, externally supplied noise)."""
    x = jnp.take(data, idx, axis=0).astype(jnp.float32)
    p = jnp.take(data, pidx, axis=0).astype(jnp.float32)
    sd = noise_sd[:, None, None]
    a = amp[:, None, None]
    lam = lam_eff[:, None, None]
    out = lam * ((x + normal_noise * sd) * a) + (1.0 - lam) * p
    return out.astype(data.dtype)
