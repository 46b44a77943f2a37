"""Latent-conditioner trainer (base + enhanced loss modes).

TPU-first rebuild of ``modules/latent_conditioner.py:213-386`` and
``modules/enhanced_latent_conditioner_training.py:16-224``: one jitted epoch
scanning device-resident (x, y1, y2) arrays with the reference's per-batch
semantics:

* image augmentation: 50% chance per batch -> outline-preserving aug
  (prob=.8) (latent_conditioner.py:244-248);
* mixup p=.02 (Beta(0.2,0.2), within-batch permutation, lc.py:250-258);
* input noise p=.05 (sigma=.01, lc.py:260-262);
* loss = 10*MSE(main) + MSE(hier) (lc.py:286-289), or the enhanced
  MSE/MAE/Huber blend + cosine perceptual loss in 'enhanced' mode;
* AdamW(lr, weight_decay) + global-norm grad clip at 10 (lc.py:299);
* LinearLR warmup (100 epochs, x0.01) then cosine annealing to 1e-8;
* validation every 10 epochs, overfit guard val/train > 1000 -> early stop
  (lc.py:341-345).

BatchNorm running stats (CNN conditioners) thread through the state; dropout
uses a per-step PRNG stream.  Spectral norm applies to the layers the
reference wraps (``sn_filter`` from the model module), via the functional
power iteration.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from simulgen_vae_tpu.data.image_augmentation import augment_images
from simulgen_vae_tpu.losses import (
    compute_enhanced_loss,
    compute_perceptual_loss,
    mse_loss,
)
from simulgen_vae_tpu.models.spectral_norm import init_sn_state, spectral_normalize
from simulgen_vae_tpu.train.schedules import lc_warmup_cosine
from simulgen_vae_tpu.utils import preemption


class LCTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    sn_u: Any
    epoch: jax.Array


class LCTrainer:
    def __init__(self, model, epochs: int, lr: float, batch_size: int,
                 weight_decay: float = 1e-4, is_image_data: bool = True,
                 loss_mode: str = "standard",
                 enhanced_config: Optional[dict] = None,
                 sn_filter: Optional[Callable] = None,
                 warmup_epochs: int = 100):
        self.model = model
        self.epochs = epochs
        self.lr = lr
        self.batch_size = batch_size
        self.is_image_data = is_image_data
        self.loss_mode = loss_mode
        self.enhanced_config = enhanced_config or {}
        self.sn_filter = sn_filter
        self.warmup_epochs = min(warmup_epochs, max(epochs // 2, 1))
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=weight_decay,
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
            variables = self.model.init(
                {"params": key, "dropout": key}, x, deterministic=True
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            sn_u = (init_sn_state(params, key, filter_fn=self.sn_filter)
                    if self.sn_filter is not None else {})
            opt_state = self.tx.init(params)
            return LCTrainState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state, sn_u=sn_u,
                                epoch=jnp.zeros((), jnp.int32))

        return jax.jit(_init)(key, x)

    # -- forward/loss ------------------------------------------------------

    def _apply(self, params, batch_stats, x, key, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train:
            out, updates = self.model.apply(
                variables, x, deterministic=False,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return out, updates.get("batch_stats", batch_stats)
        out = self.model.apply(variables, x, deterministic=True)
        return out, batch_stats

    def _loss(self, y_pred1, y_pred2, y1, y2):
        a = mse_loss(y_pred1, y1)
        b = mse_loss(y_pred2, y2)
        if self.loss_mode == "enhanced":
            loss = compute_enhanced_loss(y_pred1, y_pred2, y1, y2,
                                         self.enhanced_config)
            loss = loss + compute_perceptual_loss(y_pred1, y_pred2, y1, y2,
                                                  self.enhanced_config)
        else:
            loss = a * 10.0 + b
        return loss, a, b

    def _loss_fn(self, params, batch_stats, sn_u, x, y1, y2, key, train=True):
        if self.sn_filter is not None:
            normed, new_u = spectral_normalize(params, sn_u, update=train)
        else:
            normed, new_u = params, sn_u
        (y_pred1, y_pred2), new_bs = self._apply(normed, batch_stats, x, key,
                                                 train)
        loss, a, b = self._loss(y_pred1, y_pred2, y1, y2)
        metrics = {"loss": loss, "loss_y1": a, "loss_y2": b}
        return loss, (new_bs, new_u, metrics)

    # -- epochs ------------------------------------------------------------

    def _train_epoch_impl(self, state: LCTrainState, x, y1, y2, key):
        n = x.shape[0]
        bsz = min(self.batch_size, n)
        num_batches = max(n // bsz, 1)
        lr = lc_warmup_cosine(state.epoch, self.lr, self.epochs,
                              self.warmup_epochs)

        k_perm, k_scan = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)[: num_batches * bsz]
        perm = perm.reshape(num_batches, bsz)

        def step(carry, idx):
            params, batch_stats, opt_state, sn_u = carry
            k = jax.random.fold_in(k_scan, idx[0])
            (k_aug, k_mix_p, k_mix_lam, k_mix_perm, k_noise_p, k_noise,
             k_drop) = jax.random.split(k, 7)

            bx = jnp.take(x, idx, axis=0)
            by1 = jnp.take(y1, idx, axis=0)
            by2 = jnp.take(y2, idx, axis=0)

            if self.is_image_data:
                bx = augment_images(k_aug, bx, prob=0.8, apply_prob=0.5)

            # mixup p=.02 across batch (lc.py:250-258)
            do_mix = jax.random.uniform(k_mix_p) < 0.02
            lam = jax.random.beta(k_mix_lam, 0.2, 0.2).astype(bx.dtype)
            pidx = jax.random.permutation(k_mix_perm, bx.shape[0])
            bx = jnp.where(do_mix, lam * bx + (1 - lam) * bx[pidx], bx)
            by1 = jnp.where(do_mix, lam * by1 + (1 - lam) * by1[pidx], by1)
            by2 = jnp.where(do_mix, lam * by2 + (1 - lam) * by2[pidx], by2)

            # noise p=.05 sigma=.01 (lc.py:260-262)
            do_noise = jax.random.uniform(k_noise_p) < 0.05
            noise = jax.random.normal(k_noise, bx.shape, bx.dtype) * 0.01
            bx = jnp.where(do_noise, bx + noise, bx)

            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, (new_bs, new_u, metrics)), grads = grad_fn(
                params, batch_stats, sn_u, bx, by1, by2, k_drop
            )
            metrics["grad_norm"] = optax.global_norm(grads)

            # inject lr into the inner adamw (chain element 1)
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

    def _eval_epoch_impl(self, state: LCTrainState, x, y1, y2):
        n = x.shape[0]
        bsz = min(self.batch_size, n)
        num_batches = max(n // bsz, 1)
        idx = jnp.arange(num_batches * bsz).reshape(num_batches, bsz)

        def step(_, bidx):
            bx = jnp.take(x, bidx, axis=0)
            by1 = jnp.take(y1, bidx, axis=0)
            by2 = jnp.take(y2, bidx, axis=0)
            _, (_, _, metrics) = self._loss_fn(
                state.params, state.batch_stats, state.sn_u, bx, by1, by2,
                jax.random.PRNGKey(0), train=False,
            )
            return None, metrics

        _, metrics = jax.lax.scan(step, None, idx)
        return jax.tree.map(jnp.mean, metrics)

    # -- fit ---------------------------------------------------------------

    def fit(self, x: np.ndarray, y1: np.ndarray, y2: np.ndarray,
            key: jax.Array, state: Optional[LCTrainState] = None,
            val_split: float = 0.3, val_every: int = 10,
            overfit_threshold: float = 1000.0,
            log_fn: Optional[Callable[[int, Dict], None]] = None,
            epochs: Optional[int] = None, ckpt_manager=None,
            nan_guard: bool = True, nan_guard_max_retries: int = 2):
        """Train with the reference 0.7/0.3 split (SimulGen-VAE.py:399-400).

        NaN inputs are scrubbed to zero like LatentConditionerDataset
        (utils.py:124-134).  ``ckpt_manager`` enables mid-run checkpointing
        and resume (pass a restored ``state=``), which the reference lacks
        for the LC stage (save-only, latent_conditioner.py:383-384).
        ``nan_guard`` detects a non-finite train loss and rolls back to the
        last checkpoint with fresh randomness (train/nan_guard.py).
        """
        epochs = self.epochs if epochs is None else epochs
        x = np.nan_to_num(np.asarray(x, np.float32), nan=0.0)
        y1 = np.nan_to_num(np.asarray(y1, np.float32), nan=0.0)
        y2 = np.nan_to_num(np.asarray(y2, np.float32), nan=0.0)

        k_split, k_init, key = jax.random.split(key, 3)
        n = x.shape[0]
        n_val = int(n * val_split)
        perm = np.asarray(jax.random.permutation(k_split, n))
        tr, va = perm[: n - n_val], perm[n - n_val:]
        if n_val == 0:
            va = tr

        xt, y1t, y2t = (jnp.asarray(a[tr]) for a in (x, y1, y2))
        xv, y1v, y2v = (jnp.asarray(a[va]) for a in (x, y1, y2))

        if state is None:
            state = self.init_state(k_init, x)

        history: Dict[str, list] = {}
        val_metrics = {"loss": float("inf"), "loss_y1": 0.0, "loss_y2": 0.0}
        base_epoch = int(state.epoch)
        epoch = 0
        nan_retries = 0
        nan_fail_epoch = -1  # last epoch a non-finite loss hit
        while epoch < epochs:
            t0 = time.time()
            key, k_epoch = jax.random.split(key)
            state, metrics = self._train_epoch(state, xt, y1t, y2t, k_epoch)
            metrics = {k: float(v) for k, v in metrics.items()}

            if nan_guard and not np.isfinite(metrics["loss"]):
                from simulgen_vae_tpu.train.nan_guard import rollback

                nan_fail_epoch = max(nan_fail_epoch, epoch)
                state, epoch, history = rollback(
                    state, epoch, base_epoch, history, ckpt_manager,
                    nan_retries, nan_guard_max_retries, stage="lc")
                nan_retries += 1
                continue
            if nan_retries and epoch > nan_fail_epoch:
                # Past the epoch that diverged: give later, unrelated
                # transients their own retry budget (see vae_trainer.fit
                # for the rationale).
                nan_retries = 0

            if epoch % val_every == 0 or epoch == epochs - 1:
                vm = self._eval_epoch(state, xv, y1v, y2v)
                val_metrics = {k: float(v) for k, v in vm.items()}
                ratio = val_metrics["loss"] / max(metrics["loss"], 1e-8)
                if ratio > overfit_threshold:
                    print(f"Severe overfitting detected! Val/Train ratio: "
                          f"{ratio:.1f}; stopping at epoch {epoch}")
                    break

            metrics.update({f"val_{k}": v for k, v in val_metrics.items()})
            metrics["epoch_time"] = time.time() - t0
            for k, v in metrics.items():
                history.setdefault(k, []).append(v)
            if log_fn is not None:
                log_fn(epoch, metrics)
            if ckpt_manager is not None:
                ckpt_manager.maybe_save(state, int(state.epoch))
            if preemption.requested():
                # SIGTERM: force-save below, return early, resume later
                # (utils/preemption.py).
                break
            epoch += 1

        if ckpt_manager is not None:
            ckpt_manager.maybe_save(state, int(state.epoch), force=True)
            ckpt_manager.wait()
        return state, {k: np.asarray(v) for k, v in history.items()}

    # -- inference ---------------------------------------------------------

    def predict_fn(self, state: LCTrainState):
        """Deterministic bound forward: x -> (y1_pred, y2_pred)."""
        if self.sn_filter is not None:
            params, _ = spectral_normalize(state.params, state.sn_u,
                                           update=False)
        else:
            params = state.params

        @jax.jit
        def fn(x):
            out, _ = self._apply(params, state.batch_stats, x,
                                 jax.random.PRNGKey(0), train=False)
            return out

        return fn
