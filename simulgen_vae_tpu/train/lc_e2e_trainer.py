"""End-to-end latent-conditioner training through the frozen VAE decoder.

Rebuild of ``modules/latent_conditioner_e2e.py:213-561`` with the reference's
central defect fixed: the reference descales predicted latents by detaching
to numpy for sklearn ``inverse_transform`` (e2e.py:66-92), which severs the
gradient — its "end-to-end" reconstruction term trains nothing and only the
latent-regularization term carries gradient (SURVEY §2.5).  Here descaling is
the scaler's traceable affine inverse, so the reconstruction loss genuinely
backpropagates through the frozen decoder into the conditioner.

Semantics preserved from the reference:

* per-batch augmentation: input noise sigma=.1 (p=1), output/latent noise
  sigma=.05 (p=1) (e2e.py:148-211);
* loss = LC_alpha * recon_fn(decoder(descale(pred)), target)
  + reg_weight * (0.9*MSE(main) + 0.1*MSE(hier)) when regularization is on
  (e2e.py:379-405); recon_fn in {MSE, MAE, Huber(delta=.1), SmoothL1(beta=.1)};
* hybrid gradient clipping to [1e-5, 10] global norm (e2e.py:414-445);
* AdamW + cosine annealing (T_max=epochs, eta_min=1e-8);
* best-state tracking on validation loss.

Training-time decode mode defaults to 'fix' (deterministic, matching the
evaluator) rather than the reference's 'random' (e2e.py:371) — see the
``decode_mode`` ctor comment and docs/PARITY.md for the measured rationale.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simulgen_vae_tpu.losses import get_recon_loss, mse_loss
from simulgen_vae_tpu.models.spectral_norm import init_sn_state, spectral_normalize
from simulgen_vae_tpu.models.vae import VAE
from simulgen_vae_tpu.train.lc_trainer import LCTrainState
from simulgen_vae_tpu.train.schedules import cosine_annealing
from simulgen_vae_tpu.utils import preemption

E2E_LOSS_MAP = {
    "MSE": "MSE",
    "MAE": "MAE",
    "Huber": "Huber0.1",      # delta=0.1 (e2e.py:255)
    "SmoothL1": "SmoothL1",   # beta=0.1 (e2e.py:257)
}

_he_uniform = jax.nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def reference_e2e_reinit(params, key: jax.Array):
    """Re-initialize conditioner params with the reference E2E trainer's own
    scheme (``latent_conditioner_e2e.py:274-295``), which OVERRIDES the
    model's construction-time init:

    * Linear with ``out_features <= 64`` (i.e. every prediction head, and at
      small LC widths effectively every layer): ``normal(0, 0.1)``;
    * other Linear / Conv2d (4-D kernels): Kaiming-uniform (relu gain),
      bias zero;
    * Group/Layer/BatchNorm scale 1, bias 0;
    * Conv1d (3-D kernels) NOT touched — the reference's ``init_weights``
      matches only ``nn.Conv2d``/``nn.Linear`` (e2e.py:274-291), so torch's
      Conv1d default init survives there; here the construction-time init
      survives identically (kernel AND bias).

    Round 3's E2E head-to-head ran WITHOUT this re-init (rebuild kept
    He-uniform everywhere) and its reg-only arm trailed the reference's
    reg-only training ~2x in latent MSE — this is the parity fix.
    """
    flat = jax.tree.leaves_with_path(params)
    keys = jax.random.split(key, max(len(flat), 1))

    def _module_of(path):
        return tuple(getattr(p, "key", str(p)) for p in path[:-1])

    # Modules whose kernel is 3-D (Conv1d): the reference skips them
    # entirely, bias included.
    conv1d_modules = {
        _module_of(p) for p, leaf in flat
        if getattr(p[-1], "key", None) == "kernel" and leaf.ndim == 3
    }

    def _reinit(path, leaf, k):
        if _module_of(path) in conv1d_modules:
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "bias":
            return jnp.zeros_like(leaf)
        if name == "scale":
            return jnp.ones_like(leaf)
        if name == "kernel":
            if leaf.ndim == 2 and leaf.shape[1] <= 64:
                return (0.1 * jax.random.normal(k, leaf.shape)).astype(
                    leaf.dtype)
            return _he_uniform(k, leaf.shape, leaf.dtype)
        return leaf

    rebuilt = [_reinit(p, l, k) for (p, l), k in zip(flat, keys)]
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, rebuilt)


def hybrid_clip(min_norm: float = 1e-5, max_norm: float = 10.0):
    """Scale gradients up to min_norm / down to max_norm (e2e.py:414-445)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        g = optax.global_norm(updates)
        scale = jnp.where(
            g > max_norm, max_norm / (g + 1e-12),
            jnp.where((g > 0) & (g < min_norm), min_norm / (g + 1e-12), 1.0),
        )
        return jax.tree.map(lambda u: u * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class E2ETrainer:
    def __init__(self, lc_model, vae_model: VAE, vae_params,
                 latent_scaler, xs_scaler,
                 epochs: int, lr: float, batch_size: int,
                 weight_decay: float = 1e-5,
                 loss_function: str = "MSE",
                 lc_alpha: float = 1.0,
                 use_latent_regularization: bool = True,
                 latent_reg_weight: float = 1e-3,
                 sn_filter: Optional[Callable] = None,
                 sever_recon_gradient: bool = False,
                 reinit: bool = True,
                 decode_mode: str = "fix"):
        self.lc_model = lc_model
        self.vae_model = vae_model
        # Freeze the decoder (e2e.py:45-49).
        self.vae_params = jax.tree.map(jax.lax.stop_gradient, vae_params)
        self.latent_scaler = latent_scaler
        self.xs_scaler = xs_scaler
        self.epochs = epochs
        self.lr = lr
        self.batch_size = batch_size
        self.recon_loss = get_recon_loss(E2E_LOSS_MAP.get(loss_function, "MSE"))
        self.lc_alpha = lc_alpha
        self.use_reg = use_latent_regularization
        self.reg_weight = latent_reg_weight
        self.sn_filter = sn_filter
        # Parity probe ONLY: replicate the reference's defect where descaling
        # via sklearn detaches the graph (e2e.py:66-92), so the recon term
        # carries no gradient and only latent regularization trains.  Used by
        # scripts/head_to_head.py --stage e2e to quantify the fixed gradient.
        self.sever_recon_gradient = sever_recon_gradient
        # Reference parity: the E2E trainer re-inits the conditioner with its
        # own scheme (e2e.py:274-295).  reinit=False keeps the model's
        # construction-time init instead.
        self.reinit = reinit
        # Decoder mode for the training-time recon term.  The reference uses
        # the decoder default 'random' (e2e.py:371) but EVALUATES with
        # mode='fix' — a train/test mismatch that also drowns the restored
        # recon gradient in per-level sampling noise.  Default 'fix' trains
        # against the same deterministic decode the evaluator uses: final
        # recon-MSE ratio vs the torch reference 0.911 (3 seeds) vs 1.000
        # for 'random' (docs/artifacts/e2e_mechanism_sweep.json; declared
        # deviation, docs/PARITY.md).  Pass 'random' for reference parity.
        self.decode_mode = decode_mode
        self.tx = optax.chain(
            hybrid_clip(1e-5, 10.0),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, weight_decay=weight_decay,
            ),
        )
        self._train_epoch = jax.jit(self._train_epoch_impl)
        self._eval_epoch = jax.jit(self._eval_epoch_impl)

    # -- state -------------------------------------------------------------

    def init_state(self, key: jax.Array, sample_x: np.ndarray) -> LCTrainState:
        x = jnp.asarray(sample_x[:2])

        # One jitted (and compile-cached) program instead of thousands of
        # eager init dispatches — see VAETrainer.init_state.
        def _init(key, x):
            variables = self.lc_model.init(
                {"params": key, "dropout": key}, x, deterministic=True
            )
            params = variables["params"]
            if self.reinit:
                params = reference_e2e_reinit(params,
                                              jax.random.fold_in(key, 1))
            batch_stats = variables.get("batch_stats", {})
            sn_u = (init_sn_state(params, key, filter_fn=self.sn_filter)
                    if self.sn_filter is not None else {})
            return LCTrainState(params=params, batch_stats=batch_stats,
                                opt_state=self.tx.init(params), sn_u=sn_u,
                                epoch=jnp.zeros((), jnp.int32))

        return jax.jit(_init)(key, x)

    # -- forward -----------------------------------------------------------

    def _lc_apply(self, params, batch_stats, x, key, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train:
            out, updates = self.lc_model.apply(
                variables, x, deterministic=False,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return out, updates.get("batch_stats", batch_stats)
        return self.lc_model.apply(variables, x, deterministic=True), batch_stats

    def _decode(self, z, xs_stacked, key):
        xs_list = [xs_stacked[:, i] for i in range(xs_stacked.shape[1])]
        out, _, _ = self.vae_model.apply(
            {"params": self.vae_params}, z, xs_list, mode=self.decode_mode,
            method=VAE.decode, rngs={"sample": key},
        )
        return out

    def _descale(self, y_pred1, y_pred2):
        """Traceable affine inverse — THE gradient-path fix (vs e2e.py:66-92)."""
        z = self.latent_scaler.inverse_transform(y_pred1)
        b, nh, hd = y_pred2.shape
        xs = self.xs_scaler.inverse_transform(y_pred2.reshape(b, nh * hd))
        return z, xs.reshape(b, nh, hd)

    def _loss_fn(self, params, batch_stats, sn_u, x, y1, y2, target, key,
                 train=True):
        k_drop, k_dec = jax.random.split(key)
        if self.sn_filter is not None:
            normed, new_u = spectral_normalize(params, sn_u, update=train)
        else:
            normed, new_u = params, sn_u

        (y_pred1, y_pred2), new_bs = self._lc_apply(normed, batch_stats, x,
                                                    k_drop, train)
        z, xs = self._descale(y_pred1, y_pred2)
        if self.sever_recon_gradient:
            z, xs = jax.lax.stop_gradient((z, xs))
        reconstructed = self._decode(z, xs, k_dec)
        recon = self.recon_loss(reconstructed.astype(jnp.float32),
                                target.astype(jnp.float32))

        if self.use_reg:
            reg = (0.9 * mse_loss(y_pred1, y1)
                   + 0.1 * mse_loss(y_pred2.reshape(-1), y2.reshape(-1)))
            loss = self.lc_alpha * recon + self.reg_weight * reg
        else:
            reg = jnp.zeros(())
            loss = recon

        metrics = {"loss": loss, "recon": recon,
                   "reg": self.reg_weight * reg}
        return loss, (new_bs, new_u, metrics)

    # -- epochs ------------------------------------------------------------

    def _train_epoch_impl(self, state: LCTrainState, x, y1, y2, target, key):
        n = x.shape[0]
        bsz = min(self.batch_size, n)
        num_batches = max(n // bsz, 1)
        lr = cosine_annealing(state.epoch, self.lr, self.epochs)

        k_perm, k_scan = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)[: num_batches * bsz]
        perm = perm.reshape(num_batches, bsz)

        def step(carry, idx):
            params, batch_stats, opt_state, sn_u = carry
            k = jax.random.fold_in(k_scan, idx[0])
            kx, kt, k1, k2, k_loss = jax.random.split(k, 5)

            bx = jnp.take(x, idx, axis=0)
            by1 = jnp.take(y1, idx, axis=0)
            by2 = jnp.take(y2, idx, axis=0)
            bt = jnp.take(target, idx, axis=0)

            # augmentation (e2e.py:148-211): p=1 noise on everything
            bx = bx + jax.random.normal(kx, bx.shape, bx.dtype) * 0.1
            bt = bt + jax.random.normal(kt, bt.shape, bt.dtype) * 0.05
            by1 = by1 + jax.random.normal(k1, by1.shape, by1.dtype) * 0.05
            by2 = by2 + jax.random.normal(k2, by2.shape, by2.dtype) * 0.05

            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, (new_bs, new_u, metrics)), grads = grad_fn(
                params, batch_stats, sn_u, bx, by1, by2, bt, k_loss
            )
            metrics["grad_norm"] = optax.global_norm(grads)

            opt_state[1].hyperparams["learning_rate"] = lr
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, new_u), metrics

        carry, metrics = jax.lax.scan(
            step, (state.params, state.batch_stats, state.opt_state,
                   state.sn_u), perm,
        )
        params, batch_stats, opt_state, sn_u = carry
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["lr"] = lr
        return LCTrainState(params=params, batch_stats=batch_stats,
                            opt_state=opt_state, sn_u=sn_u,
                            epoch=state.epoch + 1), metrics

    def _eval_epoch_impl(self, state: LCTrainState, x, y1, y2, target, key):
        n = x.shape[0]
        bsz = min(self.batch_size, n)
        num_batches = max(n // bsz, 1)
        idx = jnp.arange(num_batches * bsz).reshape(num_batches, bsz)

        def step(_, bidx):
            k = jax.random.fold_in(key, bidx[0])
            _, (_, _, metrics) = self._loss_fn(
                state.params, state.batch_stats, state.sn_u,
                jnp.take(x, bidx, axis=0), jnp.take(y1, bidx, axis=0),
                jnp.take(y2, bidx, axis=0), jnp.take(target, bidx, axis=0),
                k, train=False,
            )
            return None, metrics

        _, metrics = jax.lax.scan(step, None, idx)
        return jax.tree.map(jnp.mean, metrics)

    # -- fit ---------------------------------------------------------------

    def fit(self, x, y1, y2, target, key,
            state: Optional[LCTrainState] = None, val_split: float = 0.3,
            log_fn: Optional[Callable[[int, Dict], None]] = None,
            epochs: Optional[int] = None, track_best: bool = True,
            ckpt_manager=None, nan_guard: bool = True,
            nan_guard_max_retries: int = 2):
        epochs = self.epochs if epochs is None else epochs
        arrays = [np.nan_to_num(np.asarray(a, np.float32), nan=0.0)
                  for a in (x, y1, y2, target)]

        k_split, k_init, key = jax.random.split(key, 3)
        n = arrays[0].shape[0]
        n_val = int(n * val_split)
        perm = np.asarray(jax.random.permutation(k_split, n))
        tr, va = perm[: n - n_val], perm[n - n_val:]
        if n_val == 0:
            va = tr

        train_arrays = [jnp.asarray(a[tr]) for a in arrays]
        val_arrays = [jnp.asarray(a[va]) for a in arrays]

        if state is None:
            state = self.init_state(k_init, arrays[0])

        history: Dict[str, list] = {}
        best_val = float("inf")
        best_state = state
        base_epoch = int(state.epoch)
        epoch = 0
        nan_retries = 0
        nan_fail_epoch = -1  # last epoch a non-finite loss hit
        while epoch < epochs:
            t0 = time.time()
            key, k_epoch, k_val = jax.random.split(key, 3)
            state, metrics = self._train_epoch(state, *train_arrays, k_epoch)
            vm = self._eval_epoch(state, *val_arrays, k_val)
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics.update({f"val_{k}": float(v) for k, v in vm.items()})
            metrics["epoch_time"] = time.time() - t0

            if nan_guard and not np.isfinite(metrics["loss"]):
                from simulgen_vae_tpu.train.nan_guard import rollback

                # best_state is finite by construction (a NaN val_loss never
                # wins the < comparison), so it is a valid rollback source
                # even with no checkpoint manager.
                nan_fail_epoch = max(nan_fail_epoch, epoch)
                state, epoch, history = rollback(
                    state, epoch, base_epoch, history, ckpt_manager,
                    nan_retries, nan_guard_max_retries, stage="e2e",
                    fallback_state=best_state if track_best else None)
                nan_retries += 1
                continue
            if nan_retries and epoch > nan_fail_epoch:
                # Past the epoch that diverged: give later, unrelated
                # transients their own retry budget (see vae_trainer.fit
                # for the rationale).
                nan_retries = 0

            if track_best and metrics["val_loss"] < best_val:
                best_val = metrics["val_loss"]
                best_state = state

            for k, v in metrics.items():
                history.setdefault(k, []).append(v)
            if log_fn is not None:
                log_fn(epoch, metrics)
            if ckpt_manager is not None:
                ckpt_manager.maybe_save(state, int(state.epoch))
            if preemption.requested():
                # SIGTERM: persist the CURRENT state (not best) so --resume
                # continues the optimization; best-tracking restarts cleanly
                # (utils/preemption.py).
                if ckpt_manager is not None:
                    ckpt_manager.maybe_save(state, int(state.epoch),
                                            force=True)
                    ckpt_manager.wait()
                return state, {k: np.asarray(v) for k, v in history.items()}
            epoch += 1

        final = best_state if track_best else state
        if ckpt_manager is not None:
            ckpt_manager.maybe_save(final, int(state.epoch), force=True)
            ckpt_manager.wait()
        return final, {k: np.asarray(v) for k, v in history.items()}
