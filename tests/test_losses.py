"""Loss math: closed-form KL checks, torch-parity recon losses, beta warmup."""

import numpy as np
import torch

import jax.numpy as jnp

from simulgen_vae_tpu import losses


def test_kl_standard_normal_is_zero():
    mu = jnp.zeros((4, 8))
    log_var = jnp.zeros((4, 8))
    assert float(losses.kl(mu, log_var)) == 0.0


def test_kl_closed_form():
    # KL(N(m, s^2) || N(0,1)) = 0.5*(m^2 + s^2 - ln s^2 - 1) per dim
    mu = jnp.full((2, 3), 0.5)
    log_var = jnp.full((2, 3), np.log(4.0))
    expected = 3 * 0.5 * (0.25 + 4.0 - np.log(4.0) - 1.0)
    np.testing.assert_allclose(float(losses.kl(mu, log_var)), expected, rtol=1e-6)


def test_kl_torch_parity():
    rng = np.random.default_rng(0)
    mu = rng.standard_normal((4, 8)).astype(np.float32)
    lv = rng.standard_normal((4, 8)).astype(np.float32)
    t_mu, t_lv = torch.tensor(mu), torch.tensor(lv)
    ref = torch.mean(
        0.5 * torch.sum(t_mu ** 2 + torch.exp(t_lv) - t_lv - 1, dim=[1]), dim=0
    ).item()
    np.testing.assert_allclose(float(losses.kl(jnp.asarray(mu), jnp.asarray(lv))),
                               ref, rtol=1e-5)


def test_kl_2_torch_parity():
    rng = np.random.default_rng(1)
    shape = (4, 6, 5)
    dmu, dlv, mu, lv = (rng.standard_normal(shape).astype(np.float32)
                        for _ in range(4))

    t = [torch.tensor(a) for a in (dmu, dlv, mu, lv)]
    var = torch.exp(t[3]) + 1e-8
    dvar = torch.exp(t[1])
    ref = torch.mean(
        0.5 * torch.sum(dvar / var + (t[2] - t[0]) ** 2 / var - t[1] + t[3] - 1,
                        dim=[1, 2]),
        dim=0,
    ).item()
    got = float(losses.kl_2(*[jnp.asarray(a) for a in (dmu, dlv, mu, lv)]))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_recon_losses_torch_parity():
    rng = np.random.default_rng(2)
    pred = rng.standard_normal((4, 10)).astype(np.float32) * 2
    tgt = rng.standard_normal((4, 10)).astype(np.float32)
    tp, tt = torch.tensor(pred), torch.tensor(tgt)
    cases = {
        "MSE": torch.nn.MSELoss()(tp, tt),
        "MAE": torch.nn.L1Loss()(tp, tt),
        "smoothL1": torch.nn.SmoothL1Loss()(tp, tt),
        "Huber": torch.nn.HuberLoss()(tp, tt),
        "Huber0.1": torch.nn.HuberLoss(delta=0.1)(tp, tt),
        "SmoothL1": torch.nn.SmoothL1Loss(beta=0.1)(tp, tt),
    }
    for name, ref in cases.items():
        got = float(losses.get_recon_loss(name)(jnp.asarray(pred), jnp.asarray(tgt)))
        np.testing.assert_allclose(got, ref.item(), rtol=1e-5, err_msg=name)


def test_beta_schedule_matches_reference_warmup():
    """WarmupKLLoss semantics (train.py:26-41): flat init, linear, flat target."""
    epochs = 100
    init_beta, target = 1e-4, 1.0
    start, end = 30, 80

    def ref_beta(step):
        if step < start:
            return init_beta
        if start <= step < end:
            return (step - start) * (target - init_beta) / (end - start) + init_beta
        return target

    for e in [0, 10, 29, 30, 31, 50, 79, 80, 99]:
        got = float(losses.beta_schedule(e, epochs))
        np.testing.assert_allclose(got, ref_beta(e), rtol=1e-6, err_msg=str(e))


def test_enhanced_loss_blend():
    rng = np.random.default_rng(3)
    y_pred1 = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    y1 = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    y_pred2 = jnp.asarray(rng.standard_normal((4, 3, 8)).astype(np.float32))
    y2 = jnp.asarray(rng.standard_normal((4, 3, 8)).astype(np.float32))
    cfg = {}
    got = float(losses.compute_enhanced_loss(y_pred1, y_pred2, y1, y2, cfg))

    tp1, tt1 = torch.tensor(np.asarray(y_pred1)), torch.tensor(np.asarray(y1))
    tp2, tt2 = torch.tensor(np.asarray(y_pred2)), torch.tensor(np.asarray(y2))

    def blend(p, t):
        return (0.2 * torch.nn.functional.mse_loss(p, t)
                + 0.3 * torch.nn.functional.l1_loss(p, t)
                + 0.5 * torch.nn.functional.smooth_l1_loss(p, t, beta=0.1))

    ref = (0.9 * blend(tp1, tt1) + 0.1 * blend(tp2, tt2)).item()
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    perc = float(losses.compute_perceptual_loss(
        y_pred1, y_pred2, y1, y2, {"perceptual_weight": 0.1}))
    cos1 = torch.nn.functional.cosine_similarity(tp1, tt1, dim=1).mean()
    cos2 = torch.nn.functional.cosine_similarity(
        tp2.reshape(-1, 8), tt2.reshape(-1, 8), dim=1).mean()
    ref_p = ((1 - cos1) + (1 - cos2)).item() * 0.1
    np.testing.assert_allclose(perc, ref_p, rtol=1e-4)


def test_recon_loss_pair_matches_naive_values_and_grads():
    """make_recon_loss_pair must be value- and gradient-identical to the
    naive convert-then-reduce path it replaces (vae.py forward), for every
    flavor, in f32 and bf16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simulgen_vae_tpu.losses import (RECON_LOSSES, get_recon_loss,
                                         make_recon_loss_pair, mse_loss)

    rng = np.random.default_rng(0)
    pred_np = rng.standard_normal((4, 7, 33)).astype(np.float32)
    targ_np = rng.standard_normal((4, 7, 33)).astype(np.float32)

    for name in RECON_LOSSES:
        for dtype in (jnp.float32, jnp.bfloat16):
            pred = jnp.asarray(pred_np, dtype)
            targ = jnp.asarray(targ_np, dtype)

            def naive(p, t):
                p32, t32 = p.astype(jnp.float32), t.astype(jnp.float32)
                return (get_recon_loss(name)(p32, t32)
                        + 0.7 * mse_loss(p32, t32))

            def fused(p, t):
                a, b = make_recon_loss_pair(name)(p, t)
                return a + 0.7 * b

            v0, g0 = jax.value_and_grad(naive)(pred, targ)
            v1, g1 = jax.value_and_grad(fused)(pred, targ)
            assert g1.dtype == pred.dtype
            np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                       rtol=1e-6, atol=0, err_msg=name)
            np.testing.assert_allclose(
                np.asarray(g0, np.float32), np.asarray(g1, np.float32),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}/{dtype}")
