"""Latent-conditioner model contracts: shapes, determinism, variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulgen_vae_tpu.models import (
    LatentConditioner,
    LatentConditionerImg,
    LatentConditionerViT,
    SimpleLatentConditionerImg,
)


def _init_and_run(model, x, needs_bn=False):
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           deterministic=True)
    out = model.apply(variables, x, deterministic=True)
    return variables, out


def test_mlp_conditioner_shapes():
    model = LatentConditioner(
        latent_conditioner_filter=[32, 16], latent_dim_end=32,
        input_shape=10, latent_dim=8, size2=3, dropout_rate=0.2,
    )
    x = jnp.ones((4, 10))
    _, (y1, y2) = _init_and_run(model, x)
    assert y1.shape == (4, 32)
    assert y2.shape == (4, 3, 8)
    # Tanh heads bound outputs
    assert float(jnp.abs(y1).max()) <= 1.0
    assert float(jnp.abs(y2).max()) <= 1.0


def test_mlp_adaptive_bottleneck():
    # input 484 -> complexity_ratio min(8, max(2, 7)) = 7;
    # hidden = max(64, last_filter // 7)
    model = LatentConditioner([64, 64], 32, 484, 8, 3)
    x = jnp.ones((2, 484))
    variables, (y1, y2) = _init_and_run(model, x)
    assert y1.shape == (2, 32)


@pytest.mark.slow
def test_cnn_conditioner_shapes_and_bn():
    model = LatentConditionerImg(
        latent_conditioner_filter=[8, 8, 16, 16], latent_dim_end=32,
        latent_dim=8, size2=3, dropout_rate=0.2, use_attention=True,
    )
    x = jnp.ones((2, 32 * 32))  # flattened 32x32
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           deterministic=True)
    assert "batch_stats" in variables  # BatchNorm heads
    y1, y2 = model.apply(variables, x, deterministic=True)
    assert y1.shape == (2, 32) and y2.shape == (2, 3, 8)

    # train-mode apply mutates batch stats
    (y1t, y2t), updates = model.apply(
        variables, x, deterministic=False, mutable=["batch_stats"],
        rngs={"dropout": key},
    )
    assert "batch_stats" in updates


def test_cnn_signed_input_rescale():
    """Inputs in [-1,1] are rescaled to [0,1] (cnn.py:321-322) — both ranges
    give identical outputs when the signed input is exactly 2x-1 of unsigned."""
    model = LatentConditionerImg([4, 8], 8, 4, 2, dropout_rate=0.0,
                                 use_attention=False)
    key = jax.random.PRNGKey(1)
    x01 = jax.random.uniform(key, (2, 16 * 16))
    variables = model.init({"params": key, "dropout": key}, x01,
                           deterministic=True)
    out_a = model.apply(variables, x01, deterministic=True)
    out_b = model.apply(variables, x01 * 2.0 - 1.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-5)


@pytest.mark.slow
def test_cnn_sn_filter_matches_layers():
    from simulgen_vae_tpu.models.conditioner_cnn import sn_filter
    from flax import traverse_util

    model = LatentConditionerImg([8, 8, 16], 32, 8, 3)
    x = jnp.ones((2, 32 * 32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           deterministic=True)
    flat = traverse_util.flatten_dict(variables["params"])
    sn_paths = [p for p in flat if sn_filter(p) and p[-1] == "kernel"]
    assert len(sn_paths) >= 5  # initial conv, block convs, fp linears, heads
    # output layers and skip projections are NOT spectral-normalized
    assert not any("output" in "/".join(map(str, p)) for p in sn_paths)
    assert not any("skip_proj" in "/".join(map(str, p)) for p in sn_paths)


def test_simple_cnn_shapes():
    model = SimpleLatentConditionerImg([32, 64, 128], 32, 8, 3)
    x = jnp.ones((2, 32 * 32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           deterministic=True)
    y1, y2 = model.apply(variables, x, deterministic=True)
    assert y1.shape == (2, 32) and y2.shape == (2, 3, 8)


def test_vit_conditioner_shapes():
    model = LatentConditionerViT(latent_dim_end=32, latent_dim=8, size2=3,
                                 patch_size=8, embed_dim=32, depth=2,
                                 num_heads=4)
    x = jnp.ones((2, 32 * 32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           deterministic=True)
    y1, y2 = model.apply(variables, x, deterministic=True)
    assert y1.shape == (2, 32) and y2.shape == (2, 3, 8)


def test_dropout_is_stochastic_in_train_mode():
    model = LatentConditioner([16], 8, 10, 4, 2, dropout_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 10))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x,
                           deterministic=True)
    o1 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o2[0]))
    # deterministic mode is reproducible
    d1 = model.apply(variables, x, deterministic=True)
    d2 = model.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d2[0]))
