"""FusedAdamW parity vs optax.adamw (the reference optimizer semantics,
torch AdamW defaults — modules/train.py:92)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simulgen_vae_tpu.train.optim import FusedAdamW


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "a": {"kernel": jax.random.normal(k1, (7, 5)),
              "bias": jax.random.normal(k2, (5,))},
        "b": jax.random.normal(k3, (3, 4, 2)),
    }


def test_matches_optax_adamw_over_steps():
    params = _tree(jax.random.PRNGKey(0))
    params_ref = jax.tree.map(jnp.copy, params)

    opt = FusedAdamW(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    state = opt.init(params)

    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
    )
    opt_state = tx.init(params_ref)

    for step in range(5):
        grads = _tree(jax.random.PRNGKey(100 + step))
        lr = 1e-3 * (0.9 ** step)

        params, state, gnorm = opt.apply(grads, state, params, lr)

        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params_ref)
        params_ref = optax.apply_updates(params_ref, updates)

        for ours, ref in zip(jax.tree.leaves(params),
                             jax.tree.leaves(params_ref)):
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                       rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            float(gnorm), float(optax.global_norm(grads)), rtol=1e-5
        )


def test_grad_norm_matches_global_norm():
    params = _tree(jax.random.PRNGKey(1))
    grads = _tree(jax.random.PRNGKey(2))
    opt = FusedAdamW()
    _, _, gnorm = opt.apply(grads, opt.init(params), params, 1e-3)
    np.testing.assert_allclose(float(gnorm),
                               float(optax.global_norm(grads)), rtol=1e-6)


def test_count_increments_and_jits():
    params = _tree(jax.random.PRNGKey(3))
    opt = FusedAdamW()
    state = opt.init(params)

    @jax.jit
    def step(p, s, g):
        return opt.apply(g, s, p, 1e-3)

    grads = _tree(jax.random.PRNGKey(4))
    params, state, _ = step(params, state, grads)
    params, state, _ = step(params, state, grads)
    assert int(state.count) == 2


def test_bf16_moment_dtype_tracks_f32():
    """moment_dtype=bf16 (the TPU default path) stays within bf16
    quantization of the exact f32 optimizer over a multi-step run."""
    import jax.numpy as jnp

    params = _tree(jax.random.PRNGKey(5))
    opt32 = FusedAdamW()
    opt16 = FusedAdamW(moment_dtype=jnp.bfloat16)
    s32, s16 = opt32.init(params), opt16.init(params)
    assert jax.tree.leaves(s16.mu)[0].dtype == jnp.bfloat16
    p32 = p16 = params
    for i in range(20):
        grads = _tree(jax.random.PRNGKey(10 + i))
        p32, s32, _ = opt32.apply(grads, s32, p32, 1e-3)
        p16, s16, _ = opt16.apply(grads, s16, p16, 1e-3)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        # params drift by at most ~bf16 eps of the accumulated update
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)


def test_stochastic_rounding_unbiased():
    """SR to bf16 is unbiased where round-to-nearest is systematically off:
    a value 0.3 ulp above 1.0 always RNE-rounds DOWN, but the SR mean over
    many elements must sit at the true value."""
    import jax.numpy as jnp
    from simulgen_vae_tpu.train.optim import _sr_round_bf16

    ulp = 2.0 ** -7  # bf16 ulp at 1.0
    val = 1.0 + 0.3 * ulp
    x = jnp.full((200_000,), val, jnp.float32)
    rne_mean = float(jnp.mean(x.astype(jnp.bfloat16).astype(jnp.float32)))
    sr = _sr_round_bf16(x, jax.random.key(0, impl="rbg"))
    sr_mean = float(jnp.mean(sr.astype(jnp.float32)))
    assert abs(rne_mean - val) > 0.25 * ulp          # RNE bias is real
    assert abs(sr_mean - val) < 0.02 * ulp           # SR mean is on target
    # outputs are only ever the two bracketing representables
    uniq = np.unique(np.asarray(sr, np.float32))
    assert set(uniq) <= {1.0, 1.0 + ulp}


def test_stochastic_rounding_negative_and_exact():
    """Exactly-representable values pass through untouched; negatives are
    unbiased in magnitude (sign-magnitude bits trick)."""
    import jax.numpy as jnp
    from simulgen_vae_tpu.train.optim import _sr_round_bf16

    exact = jnp.asarray([0.0, 1.0, -2.5, 0.00390625], jnp.float32)
    out = _sr_round_bf16(exact, jax.random.key(1, impl="rbg"))
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(exact))
    ulp = 2.0 ** -7
    x = jnp.full((200_000,), -(1.0 + 0.7 * ulp), jnp.float32)
    sr_mean = float(jnp.mean(_sr_round_bf16(
        x, jax.random.key(2, impl="rbg")).astype(jnp.float32)))
    assert abs(sr_mean - (-(1.0 + 0.7 * ulp))) < 0.02 * ulp


def test_fused_sr_unbiased_and_exact():
    """The fused hash-dither SR (zero-HBM-traffic path used by FusedAdamW)
    matches the RBG path's statistical contract: unbiased mean on a
    mid-ulp value, exact passthrough of representables, outputs confined
    to the two bracketing representables, and decorrelated across seeds."""
    import jax.numpy as jnp
    from simulgen_vae_tpu.train.optim import _sr_round_bf16_fused

    ulp = 2.0 ** -7
    val = 1.0 + 0.3 * ulp
    x = jnp.full((200_000,), val, jnp.float32)
    sr = _sr_round_bf16_fused(x, jnp.uint32(12345))
    sr_mean = float(jnp.mean(sr.astype(jnp.float32)))
    assert abs(sr_mean - val) < 0.02 * ulp
    uniq = np.unique(np.asarray(sr, np.float32))
    assert set(uniq) <= {1.0, 1.0 + ulp}

    exact = jnp.asarray([0.0, 1.0, -2.5, 0.00390625], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_sr_round_bf16_fused(exact, jnp.uint32(7)), np.float32),
        np.asarray(exact))

    # negatives: unbiased in magnitude
    xn = jnp.full((200_000,), -(1.0 + 0.7 * ulp), jnp.float32)
    m = float(jnp.mean(_sr_round_bf16_fused(
        xn, jnp.uint32(99)).astype(jnp.float32)))
    assert abs(m - (-(1.0 + 0.7 * ulp))) < 0.02 * ulp

    # different seeds give different roundings (step decorrelation), and
    # per-seed up-fractions agree with the true fraction
    a = np.asarray(_sr_round_bf16_fused(x, jnp.uint32(1)), np.float32)
    b = np.asarray(_sr_round_bf16_fused(x, jnp.uint32(2)), np.float32)
    assert (a != b).mean() > 0.2
    for arr in (a, b):
        assert abs((arr > 1.0).mean() - 0.3) < 0.02


def test_sr_bf16_moments_track_f32():
    """Full-bf16 moments WITH stochastic rounding stay within the same
    drift band as the deterministic bf16 path over a multi-step run, and
    the update stays jittable with a traced step count."""
    import jax.numpy as jnp

    params = _tree(jax.random.PRNGKey(7))
    opt32 = FusedAdamW()
    opt_sr = FusedAdamW(moment_dtype=jnp.bfloat16, stochastic_round=True)
    s32, ssr = opt32.init(params), opt_sr.init(params)
    step = jax.jit(lambda g, s, p: opt_sr.apply(g, s, p, 1e-3))
    p32 = psr = params
    for i in range(20):
        grads = _tree(jax.random.PRNGKey(30 + i))
        p32, s32, _ = opt32.apply(grads, s32, p32, 1e-3)
        psr, ssr, _ = step(grads, ssr, psr)
    assert jax.tree.leaves(ssr.nu)[0].dtype == jnp.bfloat16
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(psr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)
