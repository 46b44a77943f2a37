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
