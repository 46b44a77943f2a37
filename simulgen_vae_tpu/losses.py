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


# -- low-residual reconstruction loss pair ----------------------------------
#
# The train step computes the configured-flavor recon loss AND the always-on
# MSE monitor (reference VAE_network.py:79-117) on f32-converted copies of a
# [B, T, nodes] pair.  Under autodiff, XLA saves the f32-converted
# reconstruction as a residual for the backward — at flagship geometry that
# is a 1.22 GB f32 HBM write in the forward plus the re-read in the backward
# (~3.6 ms/step each at the measured ~340 GB/s floor; see docs/PERF.md,
# round-3 trace: `convert_reduce_fusion.79` emitted f32[16,200,95008]).
#
# `make_recon_loss_pair(name)` computes the identical f32 math but with a
# custom VJP whose residuals are the ORIGINAL low-precision tensors; the
# backward recomputes the convert on the fly (free inside the fusion) and
# emits the elementwise gradient directly in the input dtype — exactly the
# cotangent autodiff would produce (convert_element_type's transpose casts
# back to the primal dtype).

def _abs_grad(d):
    # lax.abs's JVP convention (+1 at d == 0), so the custom backward is
    # bit-identical to what autodiff of the naive path produced.
    return jnp.where(d >= 0, 1.0, -1.0)


def _recon_grad_fn(name: str):
    """Elementwise dLoss/dpred (f32, pre-mean-scaling) for each flavor."""
    if name == "MSE":
        return lambda d: 2.0 * d
    if name == "MAE":
        return _abs_grad
    if name in ("smoothL1", "SmoothL1"):
        beta = 1.0 if name == "smoothL1" else 0.1
        return lambda d: jnp.where(jnp.abs(d) < beta, d / beta, _abs_grad(d))
    if name in ("Huber", "Huber0.1"):
        delta = 1.0 if name == "Huber" else 0.1
        return lambda d: jnp.where(jnp.abs(d) < delta, d, delta * _abs_grad(d))
    raise KeyError(f"Unknown loss '{name}'; options: {sorted(RECON_LOSSES)}")


_RECON_PAIR_CACHE: dict = {}


def make_recon_loss_pair(name: str):
    """Return ``f(pred, target) -> (recon_loss, recon_loss_mse)`` with f32
    math and low-precision-only VJP residuals (no f32 tensor materialized)."""
    if name in _RECON_PAIR_CACHE:
        return _RECON_PAIR_CACHE[name]

    flavor = get_recon_loss(name)
    dflavor = _recon_grad_fn(name)

    @jax.custom_vjp
    def pair(pred, target):
        p32 = pred.astype(jnp.float32)
        t32 = target.astype(jnp.float32)
        return flavor(p32, t32), mse_loss(p32, t32)

    def pair_fwd(pred, target):
        return pair(pred, target), (pred, target)

    def pair_bwd(res, gs):
        pred, target = res
        g_flavor, g_mse = gs
        d = pred.astype(jnp.float32) - target.astype(jnp.float32)
        inv_n = 1.0 / d.size
        gp32 = inv_n * (g_flavor * dflavor(d) + g_mse * (2.0 * d))
        gp = gp32.astype(pred.dtype)
        return gp, (-gp32).astype(target.dtype)

    pair.defvjp(pair_fwd, pair_bwd)
    _RECON_PAIR_CACHE[name] = pair
    return pair


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
