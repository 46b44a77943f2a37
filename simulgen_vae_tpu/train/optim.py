"""Fused AdamW for the VAE train step.

``optax.adamw`` materializes an intermediate ``updates`` tree and walks the
parameters several times (moment update, bias correction, weight decay,
apply) — measured ~19.5 ms/step on the flagship 310M-param set at an
effective ~310 GB/s.  This drop-in replacement performs the whole update in
ONE elementwise pass per leaf (read p, m, v, g; write p, m, v), which XLA
fuses into a single HBM sweep, and folds the gradient-norm telemetry into
the same pass so it costs no extra read.

Math is exactly torch ``AdamW(lr, betas=(0.9, 0.999), eps=1e-8,
weight_decay=0.01)`` == ``optax.adamw`` with ``eps_root=0`` (the reference
optimizer, ``modules/train.py:92``):

    m <- b1 m + (1-b1) g            v <- b2 v + (1-b2) g^2
    p <- p - lr * ( m_hat / (sqrt(v_hat) + eps) + wd * p )

Parity with optax.adamw is asserted in ``tests/test_optim.py``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _sr_round_bf16_fused(x: jax.Array, seed: jax.Array) -> jax.Array:
    """Stochastic f32 -> bf16 rounding whose dither FUSES into the caller.

    ``jax.random.bits`` (even with the cheap RBG generator) lowers to an
    ``RngBitGenerator`` HLO whose output XLA materializes to HBM: at
    flagship scale that is ~1.2 GB/step of pure noise traffic, measured
    +3.6 ms/step on the optimizer sweep (scripts/probe_opt_sr.py: RTN
    10.97 ms, RBG-SR 14.59 ms on a 317M-param tree).  Rounding dither
    does not need a crypto-grade stream — it needs uniform 16-bit noise
    decorrelated across elements and steps.  This computes it inline as
    elementwise integer ops (the `lowbias32` avalanche mixer over the
    element index, seeded per leaf+step), so the whole thing fuses into
    the bandwidth-bound HBM sweep and costs zero extra traffic.

    ``seed`` is a traced uint32 scalar; distinct (leaf, step) pairs must
    pass distinct seeds.  Unbiasedness is the same bits-space argument as
    :func:`_sr_round_bf16` and is asserted statistically in
    ``tests/test_optim.py``."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    idx = jax.lax.iota(jnp.uint32, x.size).reshape(x.shape)
    h = idx * jnp.uint32(0x9E3779B9) + seed.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    bits = (bits + (h & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    # the masked f32 is exactly representable in bf16 -> astype is exact
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def _sr_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """Stochastically round f32 -> bf16 (unbiased): add uniform 16-bit
    noise below the bf16 mantissa cut, then truncate the low bits.

    floor((bits(x) + U[0,2^16)) / 2^16) rounds up with probability equal
    to the fractional distance to the next representable, so E[result]
    == x elementwise.  Round-to-nearest-even instead carries a small
    deterministic per-element bias that ACCUMULATES in EMA statistics
    like Adam's second moment — measured as +2-5% final recon-MSE at
    medium scale (docs/PERF.md round 3).  Sign-magnitude layout means
    the bits-space trick is unbiased for negatives too."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    bits = (bits + noise) & jnp.uint32(0xFFFF0000)
    # the masked f32 is exactly representable in bf16 -> astype is exact
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


class FusedAdamWState(NamedTuple):
    count: jax.Array   # int32 scalar
    mu: Any            # first-moment pytree (f32, like params)
    nu: Any            # second-moment pytree (f32)


class FusedAdamW:
    """Fused AdamW with a combined update+apply entry point.

    ``apply(grads, state, params, lr)`` returns
    ``(new_params, new_state, grad_norm)`` — learning rate is a traced
    scalar (the cosine-warm-restarts schedule is a function of epoch).
    """

    def __init__(self, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.01,
                 moment_dtype=None, nu_dtype='same',
                 stochastic_round: bool = False):
        """``moment_dtype`` stores the moments in a lower precision (e.g.
        bf16) while all update MATH stays f32 — halves the optimizer-state
        HBM sweep, which is ~13 ms/step at flagship scale (round-3 trace:
        the multiply_subtract dW+AdamW fusions are bandwidth-bound on
        p/m/v/g traffic).  None keeps exact f32 state (torch parity).

        ``nu_dtype`` overrides the second moment's storage separately:
        'same' follows moment_dtype; pass jnp.float32 for the mixed
        m=bf16 / v=f32 configuration (v sits under a sqrt in the update
        denominator, so its quantization moves the step size directly —
        measured +5% recon-MSE at medium scale with v in bf16,
        docs/PERF.md round 3).

        ``stochastic_round`` uses unbiased stochastic rounding (see
        ``_sr_round_bf16``) instead of round-to-nearest for every bf16
        moment downcast, keyed deterministically off the step count —
        the standard fix for the EMA rounding-bias above.  The ~16 bits
        of RBG noise per stored element fuse into the (bandwidth-bound)
        optimizer sweep."""
        self.b1, self.b2, self.eps, self.wd = b1, b2, eps, weight_decay
        self.moment_dtype = moment_dtype
        self.nu_dtype = moment_dtype if nu_dtype == 'same' else nu_dtype
        self.sr = stochastic_round

    def init(self, params) -> FusedAdamWState:
        mdt = self.moment_dtype or jnp.float32
        ndt = self.nu_dtype or jnp.float32
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros(p.shape, mdt), params),
            nu=jax.tree.map(lambda p: jnp.zeros(p.shape, ndt), params),
        )

    def apply(self, grads, state: FusedAdamWState, params, lr
              ) -> Tuple[Any, FusedAdamWState, jax.Array]:
        b1, b2, eps, wd = self.b1, self.b2, self.eps, self.wd
        count = state.count + 1
        # bias corrections as traced scalars (shared across leaves)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = jnp.asarray(lr, jnp.float32)

        flat_p, treedef = jax.tree.flatten(params)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_g = treedef.flatten_up_to(grads)

        mdt, ndt = self.moment_dtype, self.nu_dtype
        sr = self.sr and jnp.bfloat16 in (mdt, ndt)
        if sr:
            # per-step base seed; _store folds in a per-leaf offset.  The
            # golden-ratio multiply decorrelates consecutive steps before
            # the mixer inside _sr_round_bf16_fused does the heavy lifting.
            sr_step = count.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)

        def _store(x, dt, leaf_key):
            if not dt:
                return x
            if sr and dt == jnp.bfloat16:
                return _sr_round_bf16_fused(
                    x, sr_step + jnp.uint32((leaf_key * 0xC2B2AE35)
                                            & 0xFFFFFFFF))
            return x.astype(dt)

        new_p, new_m, new_v, sumsqs = [], [], [], []
        for i, (p, m, v, g) in enumerate(zip(flat_p, flat_m, flat_v, flat_g)):
            gf = g.astype(jnp.float32)
            m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
            v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * gf * gf
            mhat = m2 / c1
            vhat = v2 / c2
            pf = p.astype(jnp.float32)
            upd = mhat / (jnp.sqrt(vhat) + eps) + wd * pf
            p2 = (pf - lr * upd).astype(p.dtype)
            new_p.append(p2)
            new_m.append(_store(m2, mdt, 2 * i))
            new_v.append(_store(v2, ndt, 2 * i + 1))
            sumsqs.append(jnp.sum(gf * gf))

        grad_norm = jnp.sqrt(sum(sumsqs))
        return (
            treedef.unflatten(new_p),
            FusedAdamWState(count=count,
                            mu=treedef.unflatten(new_m),
                            nu=treedef.unflatten(new_v)),
            grad_norm,
        )
