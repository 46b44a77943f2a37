"""VAE trainer: one jitted epoch, dataset resident in device memory.

TPU-first redesign of the reference train loop (``modules/train.py:50-256``):

* The entire epoch — shuffling, batch gather, augmentation, spectral-norm
  power iteration, forward, ELBO, AdamW update — is a single jitted function
  that ``lax.scan``s over batches.  No host<->device crossing in the hot loop
  (the reference crosses per batch unless ``load_all``).
* KL warmup beta and the cosine-warm-restarts learning rate are pure
  functions of the epoch index, computed inside the jitted step.
* Optimizer: AdamW(lr, weight_decay=0.01 — torch default) with
  ``optax.inject_hyperparams`` so the lr schedule is a traced value.
* Gradient-norm telemetry comes from ``optax.global_norm`` (the reference
  computes it in a Python loop over parameters, ``train.py:156-161``).
* bf16 compute / f32 params via the model's ``dtype``; loss in f32.

Semantics preserved: loss = alpha*recon + beta*sum(KL terms); per-epoch
validation cadence; 80/20 split; on-the-fly augmentation with mixup partners
drawn from the full training set; full per-epoch sample coverage (the
reference's train DataLoader has no ``drop_last`` — augmentation.py:226-232).
Ragged final batches become a wrap-padded full batch (static shapes for
scan): the same samples train each epoch, a few appearing twice in the last
batch instead of the reference's smaller ragged batch.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from simulgen_vae_tpu.config import VAEConfig
from simulgen_vae_tpu.data.augmentation import AugmentationConfig, augment_batch
from simulgen_vae_tpu.losses import beta_schedule
from simulgen_vae_tpu.models.spectral_norm import (
    add_sigma_rank1_grads,
    compute_sigmas,
    init_sn_state,
    spectral_normalize,
)
from simulgen_vae_tpu.models.vae import VAE
from simulgen_vae_tpu.train.optim import FusedAdamW
from simulgen_vae_tpu.train.schedules import cosine_warm_restarts
from simulgen_vae_tpu.utils import preemption


class VAETrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    sn_u: Any
    epoch: jax.Array  # int32 scalar


def make_optimizer(lr: float) -> optax.GradientTransformation:
    # torch AdamW defaults: betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01
    # applied to all parameters (train.py:92).
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
    )


class VAETrainer:
    """Host-side orchestration around the jitted epoch functions."""

    def __init__(self, cfg: VAEConfig,
                 aug: AugmentationConfig = AugmentationConfig(),
                 use_spectral_norm: Optional[bool] = None,
                 donate: bool = True, fast_rng: bool = False,
                 fused_readout: Optional[bool] = None,
                 fused_aug: Optional[bool] = None):
        self.cfg = cfg
        self.aug = aug
        # Fused Pallas readout+loss train path (ops/readout_chain.py).
        # OPT-IN (SIMULGEN_FUSED_READOUT=1 or fused_readout=True): at
        # flagship scale the measured full step was 100.7 ms fused vs
        # 93.5 ms XLA (docs/PERF.md round 2) — the backward's extra y/x
        # re-reads outweigh the forward's saved stats pass.  Ignored under
        # a mesh either way (no GSPMD partitioning rule for the
        # pallas_call; a shard_map wrapper would be needed).
        self._fused_readout_opt = fused_readout
        # Fused Pallas batch assembly (ops/gather_augment.py): row gather +
        # mixup + in-register noise in one HBM pass, replacing the two
        # jnp.take gathers + elementwise augmentation.  Only covers the
        # default augmentation set (shift/cutout disabled, like the
        # reference); requires the device-resident (non-streaming) path.
        self._fused_aug_opt = fused_aug
        # fast_rng: rekey each epoch onto the RBG generator — much cheaper
        # bulk random bits on TPU than threefry (augmentation draws ~300M
        # values/step at flagship scale), at the cost of partition-dependent
        # streams; keep False when bitwise mesh/single-device equivalence
        # matters (tests rely on it).
        self.fast_rng = fast_rng
        self.mesh = None  # set by fit(mesh=...) before first compile
        self.use_sn = (cfg.use_spectral_norm if use_spectral_norm is None
                       else use_spectral_norm)
        self.model = VAE(
            latent_dim=cfg.latent_dim_end,
            hierarchical_dim=cfg.latent_dim,
            num_filter_enc=cfg.num_filter_enc,
            num_filter_dec=cfg.num_filter_dec,
            num_node=cfg.num_node,
            num_time=cfg.num_time,
            lossfun=cfg.loss_type,
            small=cfg.small,
            dtype=jnp.dtype(cfg.dtype),
            remat=cfg.remat,
        )
        # Fused AdamW (same math as torch AdamW / optax.adamw, train.py:92):
        # one HBM sweep per step instead of optax's materialized updates tree.
        # Optimizer-state precision and SN cadence resolve from the config
        # (VAEConfig.opt_state_dtype / sn_cadence, "auto" = the benched TPU
        # stack when dtype is bfloat16 — config.resolve_perf_stack).  The
        # SIMULGEN_* env vars remain as probe-script overrides and win when
        # explicitly set.
        import os as _os

        from simulgen_vae_tpu.config import resolve_perf_stack

        stack = resolve_perf_stack(cfg)
        _mdt = _os.environ.get("SIMULGEN_OPT_MOMENT_DTYPE",
                               stack["moment_dtype"])
        _ndt = _os.environ.get("SIMULGEN_OPT_NU_DTYPE", stack["nu_dtype"])
        # Stochastic rounding: unbiased bf16 moment downcasts (fixes the EMA
        # rounding bias of deterministic bf16 v — docs/PERF.md round 3).
        _sr_env = _os.environ.get("SIMULGEN_OPT_SR", "")
        _sr = (_sr_env == "1") if _sr_env else stack["stochastic_round"]
        _snpe_env = _os.environ.get("SIMULGEN_SN_PER_EPOCH", "")
        self._sn_per_epoch_resolved = ((_snpe_env in ("1", "true"))
                                       if _snpe_env else stack["sn_per_epoch"])
        self.opt = FusedAdamW(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
                              moment_dtype=jnp.dtype(_mdt) if _mdt else None,
                              nu_dtype=jnp.dtype(_ndt) if _ndt else "same",
                              stochastic_round=_sr)
        self._donate_args = (0,) if donate else ()
        self._make_jitted_fns()

    def _make_jitted_fns(self):
        """(Re)wrap the jitted entry points.

        Called at construction and whenever :meth:`set_mesh` changes the mesh:
        ``_constrain_batch`` closes over ``self.mesh`` at trace time, so a
        mesh change after a compile must invalidate the cached traces."""
        self._train_epoch = jax.jit(self._train_epoch_impl,
                                    donate_argnums=self._donate_args)
        self._train_epochs = jax.jit(self._train_epochs_impl,
                                     donate_argnums=self._donate_args)
        self._eval_epoch = jax.jit(self._eval_epoch_impl)
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=self._donate_args)

    def set_mesh(self, mesh) -> None:
        """Attach the device mesh used for GSPMD sharding constraints.

        ``fit(mesh=...)`` calls this; it is public so streaming/step-level
        callers can shard without going through ``fit``."""
        if mesh is self.mesh:
            return
        self.mesh = mesh
        self._make_jitted_fns()

    # -- state -------------------------------------------------------------

    def init_state(self, key: jax.Array) -> VAETrainState:
        # One jitted program for the WHOLE init (model.init + SN u vectors +
        # optimizer moments): eager flax init dispatches thousands of tiny
        # ops, which costs ~4 min at flagship scale on a tunneled backend
        # (~28 ms RTT each; measured in the round-5 bench phase profile).
        # As one program it is also persisted in the compile cache, so a
        # fresh process pays neither the dispatches nor the trace-compile.
        def _init(key):
            x = jnp.zeros((2, self.cfg.num_time, self.cfg.num_node),
                          jnp.dtype(self.cfg.dtype))
            variables = self.model.init({"params": key, "sample": key}, x)
            params = variables["params"]
            sn_u = (init_sn_state(params, key) if self.use_sn else {})
            opt_state = self.opt.init(params)
            return VAETrainState(params=params, opt_state=opt_state,
                                 sn_u=sn_u,
                                 epoch=jnp.zeros((), jnp.int32))

        return jax.jit(_init)(key)

    # -- loss --------------------------------------------------------------

    def _normalized_params(self, params, sn_u, update):
        if not self.use_sn:
            return params, sn_u
        # bf16 runs: normalize in bf16 (the model casts weights anyway) —
        # halves SN's HBM traffic on the ~300M-param kernel set.
        return spectral_normalize(params, sn_u, update=update,
                                  compute_dtype=self._sn_compute_dtype())

    def _rekey(self, key):
        if not self.fast_rng:
            return key
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        return jax.random.key(seed, impl="rbg")

    def _constrain_batch(self, batch):
        """Pin the gathered batch to the data/model mesh axes (GSPMD hint).

        Needed when the full dataset is replicated (sample count not
        divisible by the data axis) so the per-step compute still shards.
        """
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_ok = batch.shape[0] % self.mesh.shape["data"] == 0
        node_ok = batch.shape[-1] % self.mesh.shape["model"] == 0
        spec = P("data" if data_ok else None, None,
                 "model" if node_ok else None)
        return jax.lax.with_sharding_constraint(
            batch, NamedSharding(self.mesh, spec)
        )

    def _sn_compute_dtype(self):
        """SN power-iteration dtype.  bf16 halves SN's HBM traffic, but the
        iteration is a feedback loop (u vectors persist across steps) —
        SIMULGEN_SN_F32=1 forces f32 to probe bf16-SN's quality impact."""
        import os

        if os.environ.get("SIMULGEN_SN_F32", "0") in ("1", "true"):
            return None
        return (jnp.bfloat16
                if jnp.dtype(self.cfg.dtype) == jnp.bfloat16 else None)

    def _use_fused_readout(self) -> bool:
        import os

        if self._fused_readout_opt is not None:
            return self._fused_readout_opt and self.mesh is None
        return (os.environ.get("SIMULGEN_FUSED_READOUT", "0")
                in ("1", "true")
                and jax.default_backend() == "tpu" and self.mesh is None)

    def _use_fused_aug(self, bsz: Optional[int] = None) -> bool:
        import os

        eligible = (self.aug.enabled
                    and self.aug.shift_prob == 0
                    and self.aug.cutout_prob == 0)
        if self.mesh is not None:
            # Mesh path: the kernel runs per-device under jax.shard_map
            # (ops/gather_augment.gather_augment_sharded), which needs the
            # replicated-rows dataset layout fit() applies when this is on,
            # plus even divisibility.  OPT-IN (SIMULGEN_FUSED_AUG_MESH=1 or
            # fused_aug=True): correctness is virtual-mesh tested, but no
            # multi-chip hardware exists in this environment to measure it,
            # so XLA stays the mesh default.  The in-kernel noise path has
            # no CPU interpret lowering — off-TPU the fused mesh path is
            # only taken when the noise augment is disabled.
            noise_ok = (jax.default_backend() == "tpu"
                        or self.aug.noise_prob == 0)
            div_ok = (self.cfg.num_node % self.mesh.shape["model"] == 0
                      and (bsz is None
                           or bsz % self.mesh.shape["data"] == 0))
            if self._fused_aug_opt is not None:
                return self._fused_aug_opt and eligible and noise_ok and div_ok
            return (os.environ.get("SIMULGEN_FUSED_AUG_MESH", "0")
                    in ("1", "true") and eligible and noise_ok and div_ok)
        if self._fused_aug_opt is not None:
            return self._fused_aug_opt and eligible
        # Default ON for single-chip TPU: hardware-measured +11% step
        # throughput at flagship geometry (178.4 -> 198.0 samples/s,
        # docs/PERF.md round 3).  SIMULGEN_FUSED_AUG=0 forces the XLA
        # gather+augment chain.
        return (os.environ.get("SIMULGEN_FUSED_AUG", "1") in ("1", "true")
                and jax.default_backend() == "tpu" and eligible)

    def _gather_augment_fused(self, data, idx, partner_idx, key):
        """One-HBM-pass batch assembly (ops/gather_augment.py)."""
        from simulgen_vae_tpu.ops.gather_augment import (
            draw_augment_scalars,
            gather_augment,
            gather_augment_sharded,
        )

        k_scal, k_seed = jax.random.split(key)
        lam_eff, amp, noise_sd = draw_augment_scalars(
            k_scal, idx.shape[0],
            noise_prob=self.aug.noise_prob, noise_level=self.aug.noise_level,
            scaling_prob=self.aug.scaling_prob,
            scaling_range=self.aug.scaling_range,
            mixup_prob=self.aug.mixup_prob, mixup_alpha=self.aug.mixup_alpha)
        seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
        if self.mesh is not None:
            on_tpu = jax.default_backend() == "tpu"
            return gather_augment_sharded(
                self.mesh, data, idx, partner_idx, seed, lam_eff, amp,
                noise_sd, interpret=not on_tpu, with_noise=on_tpu)
        return gather_augment(data, idx, partner_idx, seed, lam_eff, amp,
                              noise_sd)

    def _loss_fn(self, params, sigmas, batch, key, beta):
        # Spectral norm WITHOUT materializing W/sigma: the per-kernel
        # 1/sigma collection (power iteration, computed by the caller) lets
        # each layer scale its output — saves two full passes over the
        # ~310M-param kernel set per step (models/spectral_norm.compute_sigmas).
        variables = {"params": params}
        if self.use_sn:
            variables["sn_sigma"] = sigmas
        _, recon, kls, recon_mse = self.model.apply(
            variables, batch, fused_readout_loss=self._use_fused_readout(),
            rngs={"sample": key},
        )
        kl_sum = sum(kls)
        loss = self.cfg.alpha * recon + beta * kl_sum
        metrics = {
            "loss": loss,
            "recon": self.cfg.alpha * recon,
            "kl": kl_sum,
            "recon_mse": self.cfg.alpha * recon_mse,
        }
        return loss, metrics

    def _loss_and_grads(self, params, sn_u, batch, key, beta,
                        precomputed=None):
        """value_and_grad of the step loss with sigma's parameter gradient
        applied analytically (rank-1 per kernel) instead of by autodiff,
        which materializes full [rest, out] f32 outer products to HBM —
        ~3 GB/step at flagship geometry (docs/PERF.md round 3).  Returns
        ``(metrics, new_u, grads)``.

        ``precomputed=(sigmas, factors)`` skips the power iteration and
        reuses the caller's sigma estimate — the per-epoch SN cadence
        (see :meth:`_sn_per_epoch`)."""
        if not self.use_sn:
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(params, {}, batch, key, beta)
            return metrics, sn_u, grads
        if precomputed is not None:
            sigmas, factors = precomputed
            new_u = sn_u
        else:
            sigmas, new_u, factors = compute_sigmas(
                params, sn_u, update=True,
                compute_dtype=self._sn_compute_dtype(),
                with_grad_factors=True,
            )
        grad_fn = jax.value_and_grad(self._loss_fn, argnums=(0, 1),
                                     has_aux=True)
        (_, metrics), (g_params, g_sigmas) = grad_fn(
            params, sigmas, batch, key, beta
        )
        g_params = add_sigma_rank1_grads(g_params, g_sigmas, factors)
        return metrics, new_u, g_params

    def _sn_per_epoch(self) -> bool:
        """Refresh the spectral-norm power iteration once per EPOCH instead
        of once per step (``VAEConfig.sn_cadence`` — "auto" resolves to
        per-epoch on TPU with bfloat16 compute; ``SIMULGEN_SN_PER_EPOCH``
        overrides for probes).

        The iteration itself is stop-gradded but still costs two full HBM
        reads of the ~310M-param kernel set per step (~2 ms at flagship
        geometry — docs/PERF.md round 3).  Weights drift only ~lr per
        step, so the per-step refresh mostly re-derives the same sigma;
        hoisting it to the epoch boundary amortizes the cost over the
        epoch's steps.  This deviates from the reference (torch
        ``spectral_norm`` runs one iteration per forward,
        ``modules/common.py:15-37``); quality h2h ratio 1.023
        (docs/artifacts/h2h_snpe_medium.json).  With one batch per epoch the
        two cadences are mathematically identical."""
        return self._sn_per_epoch_resolved

    # -- epochs ------------------------------------------------------------

    def _train_epoch_impl(self, state: VAETrainState, data: jax.Array,
                          key: jax.Array) -> Tuple[VAETrainState, Dict]:
        cfg = self.cfg
        n = data.shape[0]
        bsz = min(cfg.batch_size, n)
        # Cover EVERY sample each epoch like the reference (its train
        # DataLoader has no drop_last — augmentation.py:226-232): take
        # ceil(n/bsz) static-shape batches, wrapping the permutation into
        # the final batch.  A few samples repeat in that batch instead of
        # the reference's ragged small batch — static shapes for scan,
        # same per-epoch coverage.  (Dropping the remainder cost 3.7x
        # final MSE at 26-sample scale — docs/PARITY.md round 3.)
        num_batches = max(-(-n // bsz), 1)
        pad = num_batches * bsz - n

        beta = beta_schedule(state.epoch, cfg.n_epochs)
        lr = cosine_warm_restarts(state.epoch, cfg.lr,
                                  t_0=max(cfg.n_epochs // 4, 1), t_mult=2,
                                  eta_min=cfg.lr * 1e-4)

        k_perm, key = jax.random.split(key)
        k_scan = self._rekey(key)
        perm = jax.random.permutation(k_perm, n)
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])
        perm = perm.reshape(num_batches, bsz)

        fused_aug = self._use_fused_aug(bsz)

        # Per-epoch SN cadence (opt-in): one power-iteration refresh at the
        # epoch boundary, reused by every step of the scan below.
        sn_pre = None
        init_u = state.sn_u
        if self.use_sn and self._sn_per_epoch():
            sigmas0, init_u, factors0 = compute_sigmas(
                state.params, state.sn_u, update=True,
                compute_dtype=self._sn_compute_dtype(),
                with_grad_factors=True,
            )
            sn_pre = (sigmas0, factors0)

        def step(carry, idx):
            params, opt_state, sn_u = carry
            k = jax.random.fold_in(k_scan, idx[0])
            k_aug, k_partner, k_model = jax.random.split(k, 3)

            partner_idx = jax.random.randint(k_partner, (bsz,), 0, n)
            if fused_aug:
                batch = self._gather_augment_fused(data, idx, partner_idx,
                                                   k_aug)
            else:
                batch = jnp.take(data, idx, axis=0)
                partner = jnp.take(data, partner_idx, axis=0)
                batch = augment_batch(k_aug, batch, partner, self.aug)
            batch = self._constrain_batch(batch)

            metrics, new_u, grads = self._loss_and_grads(
                params, sn_u, batch, k_model, beta, precomputed=sn_pre
            )
            params, opt_state, grad_norm = self.opt.apply(
                grads, opt_state, params, lr
            )
            metrics["grad_norm"] = grad_norm
            return (params, opt_state, new_u), metrics

        (params, opt_state, sn_u), metrics = jax.lax.scan(
            step, (state.params, state.opt_state, init_u), perm
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["beta"] = beta
        metrics["lr"] = lr
        new_state = VAETrainState(params=params, opt_state=opt_state,
                                  sn_u=sn_u, epoch=state.epoch + 1)
        return new_state, metrics

    def _train_epochs_impl(self, state: VAETrainState, data: jax.Array,
                           keys: jax.Array) -> Tuple[VAETrainState, Dict]:
        """``len(keys)`` epochs in ONE dispatch: ``lax.scan`` over the jitted
        epoch body.  Identical math to calling ``_train_epoch`` in a Python
        loop; removes the per-epoch host dispatch (the host round trip costs
        several ms/epoch on a tunneled backend — docs/PERF.md round 3).
        Metrics come back stacked per-epoch ``[E]``."""
        def epoch_body(st, k):
            return self._train_epoch_impl(st, data, k)

        return jax.lax.scan(epoch_body, state, keys)

    def _train_step_impl(self, state: VAETrainState, batch: jax.Array,
                         partner: jax.Array, key: jax.Array
                         ) -> Tuple[VAETrainState, Dict]:
        """Single-batch step for host-streaming training (datasets larger
        than HBM — the flagship 484x200x95008 array is ~36 GB).  Same math as
        the scan'd epoch; batches arrive via async device_put from the host,
        which overlaps H2D with compute under jax's async dispatch."""
        cfg = self.cfg
        beta = beta_schedule(state.epoch, cfg.n_epochs)
        lr = cosine_warm_restarts(state.epoch, cfg.lr,
                                  t_0=max(cfg.n_epochs // 4, 1), t_mult=2,
                                  eta_min=cfg.lr * 1e-4)
        k_aug, k_model = jax.random.split(self._rekey(key))
        batch = augment_batch(k_aug, batch, partner, self.aug)
        batch = self._constrain_batch(batch)

        metrics, new_u, grads = self._loss_and_grads(
            state.params, state.sn_u, batch, k_model, beta
        )
        params, opt_state, grad_norm = self.opt.apply(
            grads, state.opt_state, state.params, lr
        )
        metrics["grad_norm"] = grad_norm
        metrics["beta"] = beta
        metrics["lr"] = lr
        return state.replace(params=params, opt_state=opt_state,
                             sn_u=new_u), metrics

    def train_epoch_streaming(self, state: VAETrainState, data: np.ndarray,
                              key: jax.Array, partner_mode: str = "dataset",
                              max_steps: Optional[int] = None,
                              ) -> Tuple[VAETrainState, Dict]:
        """One epoch over host-resident [N, T, nodes] data, streaming batches.

        The reference's ``load_all=0`` path (utils.py:44-66) with pinned
        buffers becomes async device_put; mixup partners are random host rows
        like the HBM path.

        ``partner_mode``: "dataset" (default) draws mixup partners uniformly
        from the whole host dataset like the reference (augmentation.py:72-78)
        — costing a second H2D batch per step; "batch" reuses the current
        device batch rolled by one sample as partners — a documented
        deviation (batch-internal mixup, the standard torch-mixup recipe)
        that HALVES host->device traffic when streaming is H2D-bound.
        ``max_steps`` truncates the epoch (benchmark use).
        """
        cfg = self.cfg
        n = data.shape[0]
        bsz = min(cfg.batch_size, n)
        num_batches = max(n // bsz, 1)
        rng = np.random.default_rng(
            int(jax.random.randint(key, (), 0, 2**31 - 1))
        )
        perm = rng.permutation(n)[: num_batches * bsz].reshape(num_batches, bsz)
        dtype = jnp.dtype(cfg.dtype)

        # Host-side gather goes through the native C++ assembler when
        # available (multi-threaded, fused f32->bf16 downcast halves H2D
        # bytes); numpy fallback otherwise.
        from simulgen_vae_tpu.data import native_loader

        to_bf16 = (dtype == jnp.bfloat16 and native_loader.BF16 is not None
                   and data.dtype == np.float32)

        sharding = None
        if self.mesh is not None:
            from simulgen_vae_tpu.parallel.sharding import batch_sharding

            sharding = batch_sharding(self.mesh, (bsz, data.shape[1],
                                                  data.shape[2]))

        def host_gather(idx):
            out = native_loader.gather_rows(data, idx, to_bf16=to_bf16)
            if not to_bf16:
                out = out.astype(dtype, copy=False)
            return jax.device_put(out, sharding)

        # Async dispatch overlaps H2D with compute, but with no backpressure
        # every batch in the epoch gets enqueued (and held live in HBM) at
        # once — at flagship scale that's tens of GB and a guaranteed OOM.
        # Keep a small in-flight window by syncing on a step that is
        # MAX_IN_FLIGHT behind (a scalar readback, so the pipe stays full).
        # Window 1 still overlaps step i+1's H2D with step i's compute; the
        # flagship working set (~10 GB of node-wide activations + grads)
        # leaves little HBM headroom for queued batches.
        MAX_IN_FLIGHT = 1
        steps = (num_batches if max_steps is None
                 else min(max_steps, num_batches))
        per_step = []
        for i in range(steps):
            idx = perm[i]
            batch = host_gather(idx)
            if partner_mode == "batch":
                partner = jnp.roll(batch, 1, axis=0)
            else:
                pidx = rng.integers(0, n, size=bsz)
                partner = host_gather(pidx)
            state, metrics = self._train_step(
                state, batch, partner, jax.random.fold_in(key, i)
            )
            per_step.append(metrics)
            if i >= MAX_IN_FLIGHT:
                per_step[i - MAX_IN_FLIGHT] = {
                    k: float(v) for k, v in per_step[i - MAX_IN_FLIGHT].items()
                }
        out = {k: float(np.mean([float(m[k]) for m in per_step]))
               for k in per_step[0]}
        return state.replace(epoch=state.epoch + 1), out

    def _eval_epoch_impl(self, state: VAETrainState, data: jax.Array,
                         key: jax.Array) -> Dict:
        cfg = self.cfg
        n = data.shape[0]
        bsz = min(cfg.batch_size, n)
        # Wrap-pad like the train epoch: the reference's val loader has no
        # drop_last either, so cover all val samples (repeats in the final
        # batch bias the mean by <= (bsz-1)/n of one batch's weight).
        num_batches = max(-(-n // bsz), 1)
        beta = beta_schedule(state.epoch, cfg.n_epochs)
        idx = jnp.arange(num_batches * bsz) % n
        idx = idx.reshape(num_batches, bsz)

        if self.use_sn:
            sigmas, _ = compute_sigmas(
                state.params, state.sn_u, update=False,
                compute_dtype=self._sn_compute_dtype(),
            )
        else:
            sigmas = {}

        def step(_, batch_idx):
            k = jax.random.fold_in(key, batch_idx[0])
            batch = jnp.take(data, batch_idx, axis=0)
            _, metrics = self._loss_fn(
                state.params, sigmas, batch, k, beta
            )
            return None, metrics

        _, metrics = jax.lax.scan(step, None, idx)
        return jax.tree.map(jnp.mean, metrics)

    # -- fit ---------------------------------------------------------------

    def fit(self, data: np.ndarray, key: jax.Array,
            state: Optional[VAETrainState] = None,
            val_split: float = 0.2, val_every: int = 20,
            log_fn: Optional[Callable[[int, Dict], None]] = None,
            epochs: Optional[int] = None, mesh=None, stream: bool = False,
            ckpt_manager=None, nan_guard: bool = True,
            nan_guard_max_retries: int = 2):
        """Train on [P, T, N] data with an 80/20 split (reference default).

        ``nan_guard`` (default on) checks the train loss for divergence at
        every host-visible boundary — the loss floats are already fetched
        for logging, so detection is free.  On a non-finite loss the run
        rolls back to the last checkpoint (``ckpt_manager``) and retries the
        span with fresh shuffle/augmentation randomness, at most
        ``nan_guard_max_retries`` times; a poisoned state is never
        checkpointed.  Without a checkpoint to roll back to it raises
        immediately instead of silently training on NaNs (the reference has
        no divergence detection at all — a NaN at epoch 10 of 2002 burns the
        whole run; SURVEY §5 "failure detection").

        If ``mesh`` is given, the state and data are placed with the
        node-axis/data-axis GSPMD shardings from ``parallel.sharding``.
        ``stream=True`` keeps the dataset in host memory and streams batches
        (for arrays larger than HBM); validation then runs on a device-sized
        subset.  Returns (state, history dict of per-epoch metric arrays).
        """
        cfg = self.cfg
        epochs = cfg.n_epochs if epochs is None else epochs
        if mesh is not None:
            self.set_mesh(mesh)
        mesh = self.mesh
        k_split, k_init, key = jax.random.split(key, 3)

        # Multi-process (real pod) support: every process runs this same
        # control flow with identical PRNG keys, so the split/shuffle/init
        # below are bitwise-identical across hosts; all device placement
        # goes through parallel.sharding.place_global, which assembles
        # global jax.Arrays from the per-host copy (each device pulls only
        # its addressable shard).  Reference analog: torchrun ranks each
        # load the full dataset (SimulGen-VAE.py:277-283) — but here the
        # gradients are actually combined (the reference's DDP is vestigial,
        # SURVEY §2.7).
        multiproc = jax.process_count() > 1
        if multiproc and mesh is None:
            raise ValueError(
                "multi-process training requires a mesh spanning all "
                "processes (parallel.mesh.make_mesh after "
                "jax.distributed.initialize)")
        if multiproc and stream:
            raise NotImplementedError(
                "stream=True is single-controller only; shard the dataset "
                "across hosts and use load_all=1 per host instead")

        n = data.shape[0]
        n_val = int(n * val_split)
        perm = np.asarray(jax.random.permutation(k_split, n))
        train_idx, val_idx = perm[: n - n_val], perm[n - n_val:]

        if stream:
            data = np.asarray(data)
            data_train = data[train_idx]
            val_cap = max(cfg.batch_size, min(n_val, 4 * cfg.batch_size))
            data_val = jnp.asarray(
                data[val_idx][:val_cap] if n_val else data_train[:val_cap],
                jnp.dtype(cfg.dtype),
            )
        elif multiproc:
            # Keep host-side data as numpy: a jnp.asarray here would commit
            # the full array to this process's local devices before the
            # global placement below.
            data = np.asarray(data, jnp.dtype(cfg.dtype))
            data_train = data[train_idx]
            data_val = data[val_idx] if n_val else data_train
        else:
            data = jnp.asarray(data, jnp.dtype(cfg.dtype))
            data_train = data[train_idx]
            data_val = data[val_idx] if n_val else data_train

        if state is None:
            state = self.init_state(k_init)

        if mesh is not None:
            from simulgen_vae_tpu.parallel.sharding import (
                shard_batch,
                shard_state,
            )

            state = shard_state(state, mesh, cfg.num_node)
            data_val = shard_batch(data_val, mesh)
            if not stream:
                bsz = min(cfg.batch_size, data_train.shape[0])
                if self._use_fused_aug(bsz):
                    # Fused mesh assembly gathers rows per-device under
                    # shard_map: rows must be replicated over the data axis
                    # (see ops/gather_augment.gather_augment_sharded).
                    from simulgen_vae_tpu.ops.gather_augment import (
                        dataset_replicated_rows_sharding,
                    )
                    from simulgen_vae_tpu.parallel.sharding import (
                        place_global,
                    )

                    data_train = place_global(
                        data_train,
                        dataset_replicated_rows_sharding(
                            mesh, np.shape(data_train)))
                else:
                    data_train = shard_batch(data_train, mesh)

        history: Dict[str, list] = {}
        val_metrics = {"loss": 0.0, "recon": 0.0}

        # Multi-epoch dispatch: epochs between host-visible boundaries
        # (validation epochs, checkpoint-save epochs, the final epoch) run as
        # ONE jitted lax.scan over the epoch body (self._train_epochs) —
        # identical math, but the per-epoch host dispatch/donation round trip
        # (~3.5 ms/step of wall-device gap at flagship geometry,
        # docs/PERF.md "Trace accounting at 244.0") is paid once per chunk.
        # Only spans of exactly ``val_every`` epochs use the chunked program
        # so at most ONE extra program shape is compiled; ragged spans (run
        # tails, checkpoint-offset chunks) fall back to per-epoch dispatch.
        base_epoch = int(state.epoch)

        def _need_host_state(e: int) -> bool:
            if e % val_every == 0 or e == epochs - 1:
                return True
            return (ckpt_manager is not None
                    and (base_epoch + e + 1) % ckpt_manager.save_interval == 0)

        epoch = 0
        nan_retries = 0
        nan_fail_epoch = -1  # last epoch a non-finite span reached
        while epoch < epochs:
            t0 = time.time()
            end = epoch
            while end < epochs - 1 and not _need_host_state(end):
                end += 1
            span = end - epoch + 1

            key, k_val = jax.random.split(key)
            if stream:
                span = 1
                key, k_epoch = jax.random.split(key)
                state, metrics = self.train_epoch_streaming(
                    state, data_train, k_epoch
                )
                stacked = {k: [v] for k, v in metrics.items()}
            elif span == val_every:
                key, *ks = jax.random.split(key, span + 1)
                state, metrics = self._train_epochs(
                    state, data_train, jnp.stack(ks))
                stacked = {k: np.asarray(v) for k, v in metrics.items()}
            else:
                span = 1
                key, k_epoch = jax.random.split(key)
                state, metrics = self._train_epoch(state, data_train, k_epoch)
                stacked = {k: [v] for k, v in metrics.items()}

            if nan_guard and not np.isfinite(
                    np.asarray(stacked["loss"], np.float64)).all():
                from simulgen_vae_tpu.train.nan_guard import rollback

                nan_fail_epoch = max(nan_fail_epoch, epoch + span - 1)
                state, epoch, history = rollback(
                    state, epoch, base_epoch, history, ckpt_manager,
                    nan_retries, nan_guard_max_retries, stage="vae")
                nan_retries += 1
                continue
            if nan_retries and epoch + span - 1 > nan_fail_epoch:
                # Progressed past the epoch that diverged: the retry budget
                # guards REPEATED failure at one point, not the whole run —
                # an unrelated transient hundreds of epochs later gets its
                # own budget (resetting only after passing the failure epoch
                # keeps a deterministic NaN from looping forever).
                nan_retries = 0

            last = epoch + span - 1
            if last % val_every == 0 or last == epochs - 1:
                vm = self._eval_epoch(state, data_val, k_val)
                val_metrics = {k: float(v) for k, v in vm.items()}

            per_epoch = time.time() - t0
            for j in range(span):
                m = {k: float(v[j]) for k, v in stacked.items()}
                m["val_loss"] = val_metrics["loss"]
                m["val_recon"] = val_metrics["recon"]
                m["epoch_time"] = per_epoch / span
                for k, v in m.items():
                    history.setdefault(k, []).append(v)
                if log_fn is not None:
                    log_fn(epoch + j, m)
            if ckpt_manager is not None:
                ckpt_manager.maybe_save(state, int(state.epoch))
            epoch += span
            if preemption.requested():
                # Cooperative stop (SIGTERM): fall through to the force-save
                # below so the full train state lands on disk, then return
                # early.  The CLI exits EX_TEMPFAIL; --resume continues from
                # exactly this epoch (utils/preemption.py).
                break

        if ckpt_manager is not None:
            ckpt_manager.maybe_save(state, int(state.epoch), force=True)
            ckpt_manager.wait()
        return state, {k: np.asarray(v) for k, v in history.items()}

    # -- inference helpers -------------------------------------------------

    def eval_params(self, state: VAETrainState):
        """Spectral-normalized params for inference (torch eval semantics)."""
        normed, _ = self._normalized_params(state.params, state.sn_u,
                                            update=False)
        return normed
