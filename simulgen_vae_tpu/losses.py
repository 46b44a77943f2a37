"""Loss functions: ELBO KL terms, reconstruction losses, KL warmup schedule.

Math mirrors the reference exactly:

* ``kl``       <- ``modules/losses.py:8-32``
* ``kl_2``     <- ``modules/losses.py:34-48``
* recon losses <- torch ``MSELoss/L1Loss/SmoothL1Loss/HuberLoss`` defaults as
  selected in ``modules/VAE_network.py:71-77``
* ``beta_schedule`` <- ``modules/train.py:18-41,75-79`` (``WarmupKLLoss``):
  beta = init until 30% of epochs, linear to target at 80%, then flat.
* enhanced LC losses <- ``modules/enhanced_loss_functions.py:5-50``

All functions are pure jax and differentiate/jit cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_VAR_CLAMP = 30.0


def kl(mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """KL(q(z|x) || N(0, I)) summed over latent dim, mean over batch."""
    log_var = jnp.clip(log_var, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
    var = jnp.exp(log_var)
    loss = 0.5 * jnp.sum(mu ** 2 + var - log_var - 1.0, axis=1)
    return jnp.mean(loss, axis=0)


def kl_2(delta_mu: jax.Array, delta_log_var: jax.Array,
         mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """Hierarchical KL of the delta-posterior against the conv prior.

    Inputs are per-level feature maps ``[B, T, C]`` (any trailing layout: the
    sum runs over all non-batch axes, matching the reference's
    ``dim=[1, 2]``).
    """
    log_var = jnp.clip(log_var, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
    delta_log_var = jnp.clip(delta_log_var, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
    var = jnp.exp(log_var) + 1e-8
    delta_var = jnp.exp(delta_log_var)
    loss = 0.5 * jnp.sum(
        delta_var / var + (mu - delta_mu) ** 2 / var - delta_log_var + log_var - 1.0,
        axis=tuple(range(1, mu.ndim)),
    )
    return jnp.mean(loss, axis=0)


# -- reconstruction losses (torch-default semantics) -----------------------

def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def mae_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def smooth_l1_loss(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta))


def huber_loss(pred, target, delta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < delta, 0.5 * d ** 2, delta * (d - 0.5 * delta)))


RECON_LOSSES = {
    "MSE": mse_loss,
    "MAE": mae_loss,
    "smoothL1": smooth_l1_loss,
    "Huber": huber_loss,
    # E2E trainer variants with reduced transition points
    # (latent_conditioner_e2e.py:255-257)
    "Huber0.1": lambda p, t: huber_loss(p, t, delta=0.1),
    "SmoothL1": lambda p, t: smooth_l1_loss(p, t, beta=0.1),
}


def get_recon_loss(name: str):
    if name not in RECON_LOSSES:
        raise KeyError(f"Unknown loss '{name}'; options: {sorted(RECON_LOSSES)}")
    return RECON_LOSSES[name]


# -- KL warmup -------------------------------------------------------------

def beta_schedule(epoch, n_epochs: int, init_beta: float = 1e-4,
                  beta_target: float = 1.0, start_frac: float = 0.3,
                  end_frac: float = 0.8):
    """Piecewise-linear KL warmup coefficient as a pure function of epoch.

    Mirrors ``WarmupKLLoss.get_loss`` (``modules/train.py:26-41``) with the
    hardcoded ``init_beta=1e-4 -> 1.0`` over epochs [30%, 80%] used by the
    reference trainer (``modules/train.py:75-79``).  Traced-value friendly.
    """
    start = int(n_epochs * start_frac)
    end = int(n_epochs * end_frac)
    epoch = jnp.asarray(epoch, jnp.float32)
    slope = (beta_target - init_beta) / max(end - start, 1)
    lin = (epoch - start) * slope + init_beta
    return jnp.clip(lin, init_beta, beta_target)


# -- enhanced latent-conditioner losses ------------------------------------

def compute_enhanced_loss(y_pred1, y_pred2, y1, y2, config: dict):
    """Weighted MSE/MAE/Huber blend, mirrors enhanced_loss_functions.py:5-31."""
    mse_w = config.get("mse_weight", 0.2)
    mae_w = config.get("mae_weight", 0.3)
    hub_w = config.get("huber_weight", 0.5)
    hub_beta = config.get("huber_beta", 0.1)

    def blend(pred, tgt):
        out = mse_w * mse_loss(pred, tgt)
        if mae_w > 0:
            out = out + mae_w * mae_loss(pred, tgt)
        if hub_w > 0:
            out = out + hub_w * smooth_l1_loss(pred, tgt, beta=hub_beta)
        return out

    loss_main = blend(y_pred1, y1)
    loss_hier = blend(y_pred2, y2)
    return (config.get("main_weight", 0.9) * loss_main
            + config.get("hier_weight", 0.1) * loss_hier)


def compute_perceptual_loss(y_pred1, y_pred2, y1, y2, config: dict):
    """Cosine-similarity 'perceptual' loss, mirrors enhanced_loss_functions.py:33-50."""
    w = config.get("perceptual_weight", 0)
    if w <= 0:
        return 0.0

    def cos(a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
        return jnp.mean(num / den)

    perceptual_main = 1.0 - cos(y_pred1, y1)
    hier_dim = y_pred2.shape[-1]
    perceptual_hier = 1.0 - cos(y_pred2.reshape(-1, hier_dim),
                                y2.reshape(-1, hier_dim))
    return (perceptual_main + perceptual_hier) * w


def log_sum_exp(x: jax.Array) -> jax.Array:
    """Numerically stable log-sum-exp over axis 1 (reference losses.py:50-53)."""
    m = jnp.max(x, axis=1, keepdims=True)
    return m[:, :, None] + jnp.log(jnp.sum(jnp.exp(x - m), axis=1))
