"""LC trainer (base + enhanced) and E2E trainer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models import LatentConditioner, VAE
from simulgen_vae_tpu.train.lc_trainer import LCTrainer
from simulgen_vae_tpu.train.lc_e2e_trainer import E2ETrainer, hybrid_clip


@pytest.fixture(scope="module")
def lc_data():
    rng = np.random.default_rng(0)
    n, d = 32, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    w1 = rng.standard_normal((d, 8)).astype(np.float32) * 0.3
    y1 = np.tanh(x @ w1)
    y2 = np.tanh(x @ rng.standard_normal((d, 6)).astype(np.float32) * 0.3)
    y2 = y2.reshape(n, 2, 3)
    return x, y1, y2


def make_mlp():
    return LatentConditioner(
        latent_conditioner_filter=[16, 16], latent_dim_end=8,
        input_shape=16, latent_dim=3, size2=2, dropout_rate=0.1,
    )


@pytest.mark.slow
def test_lc_training_loss_decreases(lc_data):
    x, y1, y2 = lc_data
    trainer = LCTrainer(make_mlp(), epochs=40, lr=3e-3, batch_size=8,
                        weight_decay=1e-5, is_image_data=False)
    state, hist = trainer.fit(x, y1, y2, jax.random.PRNGKey(0), epochs=40)
    assert hist["loss"][-1] < hist["loss"][0]
    assert np.isfinite(hist["loss"]).all()

    # prediction fn works, deterministic
    pred = trainer.predict_fn(state)
    p1, p2 = pred(jnp.asarray(x[:4]))
    assert p1.shape == (4, 8) and p2.shape == (4, 2, 3)


@pytest.mark.slow
def test_lc_enhanced_loss_mode(lc_data):
    x, y1, y2 = lc_data
    trainer = LCTrainer(make_mlp(), epochs=6, lr=1e-3, batch_size=8,
                        is_image_data=False, loss_mode="enhanced",
                        enhanced_config={"perceptual_weight": 0.1})
    state, hist = trainer.fit(x, y1, y2, jax.random.PRNGKey(1), epochs=6)
    assert np.isfinite(hist["loss"]).all()


def test_lc_warmup_schedule(lc_data):
    x, y1, y2 = lc_data
    trainer = LCTrainer(make_mlp(), epochs=20, lr=1e-3, batch_size=8,
                        is_image_data=False, warmup_epochs=5)
    _, hist = trainer.fit(x, y1, y2, jax.random.PRNGKey(2), epochs=8)
    # warmup: lr rises from 1% toward base
    assert hist["lr"][0] < hist["lr"][4]
    np.testing.assert_allclose(hist["lr"][0], 1e-3 * 0.01, rtol=1e-4)


def test_hybrid_clip():
    import optax

    clip = hybrid_clip(1e-2, 1.0)
    state = clip.init(None)

    big = {"w": jnp.full((4,), 10.0)}
    out, _ = clip.update(big, state)
    np.testing.assert_allclose(float(optax.global_norm(out)), 1.0, rtol=1e-5)

    tiny = {"w": jnp.full((4,), 1e-5)}
    out, _ = clip.update(tiny, state)
    np.testing.assert_allclose(float(optax.global_norm(out)), 1e-2, rtol=1e-4)

    mid = {"w": jnp.full((4,), 0.1)}
    out, _ = clip.update(mid, state)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


class FakeScaler:
    """Affine stand-in for MinMaxScaler stats."""

    def __init__(self, scale, minv):
        self.scale_ = scale
        self.min_ = minv

    def transform(self, x):
        return x * self.scale_ + self.min_

    def inverse_transform(self, x):
        return (x - self.min_) / self.scale_


@pytest.fixture(scope="module")
def tiny_vae():
    filters = [8, 8]
    model = VAE(latent_dim=8, hierarchical_dim=3, num_filter_enc=filters,
                num_filter_dec=filters[::-1], num_node=16, num_time=10,
                small=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 10, 16))
    params = model.init({"params": key, "sample": key}, x)["params"]
    return model, params


@pytest.mark.slow
def test_e2e_gradient_flows_through_decoder(lc_data, tiny_vae):
    """The reconstruction term must carry gradient to the conditioner even
    with regularization off — the very path the reference severs."""
    x, y1, y2 = lc_data
    y2 = y2[:, :, :]  # [n, 2, 3]
    vae_model, vae_params = tiny_vae
    rng = np.random.default_rng(1)
    target = rng.standard_normal((x.shape[0], 10, 16)).astype(np.float32)

    lc = LatentConditioner([16, 16], 8, 16, 3, 2, dropout_rate=0.0)
    # note: decoder consumes xs[0] only (2 filters -> 1 level, no injection);
    # use a 3-level VAE path via size2=2 anyway — decoder slices what it needs.
    trainer = E2ETrainer(
        lc, vae_model, vae_params,
        latent_scaler=FakeScaler(0.5, 0.1), xs_scaler=FakeScaler(0.5, 0.1),
        epochs=4, lr=1e-3, batch_size=8,
        use_latent_regularization=False,  # isolate the recon path
    )
    state = trainer.init_state(jax.random.PRNGKey(0), x)

    loss, (_, _, metrics) = trainer._loss_fn(
        state.params, state.batch_stats, state.sn_u,
        jnp.asarray(x[:8]), jnp.asarray(y1[:8]), jnp.asarray(y2[:8]),
        jnp.asarray(target[:8]), jax.random.PRNGKey(1), train=False,
    )
    grads = jax.grad(
        lambda p: trainer._loss_fn(
            p, state.batch_stats, state.sn_u, jnp.asarray(x[:8]),
            jnp.asarray(y1[:8]), jnp.asarray(y2[:8]), jnp.asarray(target[:8]),
            jax.random.PRNGKey(1), train=False,
        )[0]
    )(state.params)
    gnorm = float(np.sqrt(sum(float(jnp.sum(g ** 2))
                              for g in jax.tree.leaves(grads))))
    assert gnorm > 1e-8, "recon gradient is severed!"


@pytest.mark.slow
def test_e2e_training_runs(lc_data, tiny_vae):
    x, y1, y2 = lc_data
    vae_model, vae_params = tiny_vae
    rng = np.random.default_rng(2)
    target = rng.standard_normal((x.shape[0], 10, 16)).astype(np.float32)

    lc = LatentConditioner([16, 16], 8, 16, 3, 2, dropout_rate=0.1)
    trainer = E2ETrainer(
        lc, vae_model, vae_params,
        latent_scaler=FakeScaler(0.5, 0.1), xs_scaler=FakeScaler(0.5, 0.1),
        epochs=5, lr=1e-3, batch_size=8, loss_function="Huber",
        lc_alpha=10.0, use_latent_regularization=True,
        latent_reg_weight=1e-3,
    )
    state, hist = trainer.fit(x, y1, y2, target, jax.random.PRNGKey(3),
                              epochs=5)
    assert np.isfinite(hist["loss"]).all()
    assert (hist["grad_norm"] >= 1e-5 - 1e-9).all()  # hybrid clip floor


def test_e2e_reference_reinit(lc_data, tiny_vae):
    """E2ETrainer applies the reference E2E trainer's own re-init scheme
    (latent_conditioner_e2e.py:274-295): normal(0, 0.1) for Linear kernels
    with out_features <= 64, zero biases, norm scales 1."""
    x, _, _ = lc_data
    vae_model, vae_params = tiny_vae
    lc = LatentConditioner([48, 48], 8, 16, 3, 2, dropout_rate=0.0)
    kwargs = dict(
        latent_scaler=FakeScaler(0.5, 0.1), xs_scaler=FakeScaler(0.5, 0.1),
        epochs=2, lr=1e-3, batch_size=8,
    )
    t_on = E2ETrainer(lc, vae_model, vae_params, reinit=True, **kwargs)
    t_off = E2ETrainer(lc, vae_model, vae_params, reinit=False, **kwargs)
    s_on = t_on.init_state(jax.random.PRNGKey(0), x)
    s_off = t_off.init_state(jax.random.PRNGKey(0), x)

    import jax.tree_util as jtu
    stds, any_kernel = [], False
    for path, leaf in jtu.tree_leaves_with_path(s_on.params):
        name = path[-1].key
        if name == "bias":
            assert float(jnp.abs(leaf).max()) == 0.0
        elif name == "scale":
            assert float(jnp.abs(leaf - 1.0).max()) == 0.0
        elif name == "kernel" and leaf.ndim == 2 and leaf.shape[1] <= 64:
            any_kernel = True
            stds.append(float(jnp.std(leaf)))
    assert any_kernel
    # normal(0, 0.1) across many elements
    assert 0.05 < float(np.mean(stds)) < 0.15

    # reinit=False keeps the model's construction-time init (He-uniform),
    # which differs from the reinit
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        s_on.params, s_off.params)
    assert max(jax.tree.leaves(diff)) > 1e-3


def test_e2e_reinit_skips_conv1d():
    """The reference's init_weights matches only nn.Conv2d/nn.Linear
    (latent_conditioner_e2e.py:274-291) — Conv1d keeps torch's default
    init, so the rebuild's re-init must leave 3-D kernels (and their
    biases) at construction-time values."""
    from simulgen_vae_tpu.train.lc_e2e_trainer import reference_e2e_reinit

    params = {
        "Conv1d_0": {"kernel": jnp.ones((3, 8, 4)),
                     "bias": jnp.full((4,), 0.5)},
        "Dense_0": {"kernel": jnp.ones((8, 4)),
                    "bias": jnp.full((4,), 0.5)},
        "Conv2d_0": {"kernel": jnp.ones((3, 3, 8, 4)),
                     "bias": jnp.full((4,), 0.5)},
    }
    out = reference_e2e_reinit(params, jax.random.PRNGKey(0))
    # Conv1d: untouched, bias included
    assert float(jnp.abs(out["Conv1d_0"]["kernel"] - 1).max()) == 0.0
    assert float(jnp.abs(out["Conv1d_0"]["bias"] - 0.5).max()) == 0.0
    # Linear (<=64 out): normal(0, .1) kernel, zero bias
    assert float(jnp.abs(out["Dense_0"]["bias"]).max()) == 0.0
    assert float(jnp.abs(out["Dense_0"]["kernel"] - 1).max()) > 0.5
    # Conv2d: He-uniform kernel, zero bias
    assert float(jnp.abs(out["Conv2d_0"]["bias"]).max()) == 0.0
    assert float(jnp.abs(out["Conv2d_0"]["kernel"] - 1).max()) > 0.5
