"""Sharded serving: make_generate_fn(mesh=...) on the virtual 8-device mesh.

The serving graph reuses the training sharding rules (requests over
``data``, node-sized decoder tensors over ``model`` — parallel/sharding.py);
this verifies the sharded pipeline compiles, executes, and matches the
single-device decode, including through the int8 quant path.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulgen_vae_tpu.generate import make_generate_fn
from simulgen_vae_tpu.models import LatentConditioner
from simulgen_vae_tpu.models.vae import VAE
from simulgen_vae_tpu.parallel.mesh import make_mesh


def _fake_scaler(n):
    return SimpleNamespace(min_=np.zeros(n, np.float32),
                           scale_=np.full(n, 0.5, np.float32))


@pytest.fixture(scope="module")
def pipeline():
    node, t, z_end, hier, size2 = 64, 10, 8, 4, 1
    filters = [16, 8]
    vae = VAE(latent_dim=z_end, hierarchical_dim=hier,
              num_filter_enc=filters, num_filter_dec=filters[::-1],
              num_node=node, num_time=t, small=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, t, node))
    vae_vars = {"params": vae.init({"params": key, "sample": key},
                                   x)["params"]}
    lc = LatentConditioner([8, 8], z_end, 4, hier, size2, dropout_rate=0.0)
    lc_vars = lc.init({"params": key, "dropout": key}, jnp.zeros((1, 4)),
                      deterministic=True)
    return dict(
        cfg=SimpleNamespace(num_node=node),
        vae_model=vae, vae_vars=vae_vars, lc_model=lc, lc_vars=lc_vars,
        lv_scaler=_fake_scaler(z_end),
        xs_scaler=_fake_scaler(size2 * hier),
        data_scaler=_fake_scaler(node),
    )


def _inputs(batch=4):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((batch, 4)).astype(np.float32))


@pytest.mark.slow
def test_sharded_generate_matches_single_device(pipeline):
    x = _inputs()
    ref = np.asarray(make_generate_fn(dict(pipeline))(x))
    mesh = make_mesh(data=2, model=4)
    out = np.asarray(make_generate_fn(dict(pipeline), mesh=mesh)(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_sharded_generate_int8(pipeline):
    x = _inputs()
    mesh = make_mesh(data=2, model=4)
    f_q = np.asarray(
        make_generate_fn(dict(pipeline), quantize="int8", mesh=mesh)(x))
    ref = np.asarray(make_generate_fn(dict(pipeline))(x))
    rel = np.linalg.norm(f_q - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_sharded_generate_odd_batch_falls_back(pipeline):
    """A batch that doesn't divide the data axis still runs (replicated)."""
    x = _inputs(batch=3)
    mesh = make_mesh(data=2, model=4)
    out = np.asarray(make_generate_fn(dict(pipeline), mesh=mesh)(x))
    assert out.shape[0] == 3


@pytest.mark.slow
def test_sharded_generate_chunks_oversized_requests(pipeline):
    """max_batch=4 on a 2-way data mesh: 10 rows -> 4+4+padded-2, equal to
    the whole-batch decode (chunk stays a multiple of the data axis)."""
    x = _inputs(batch=10)
    mesh = make_mesh(data=2, model=4)
    whole = np.asarray(make_generate_fn(dict(pipeline), mesh=mesh)(x))
    parts = np.asarray(
        make_generate_fn(dict(pipeline), mesh=mesh, max_batch=4)(x))
    assert parts.shape == whole.shape == (10, 10, 64)
    np.testing.assert_allclose(parts, whole, rtol=2e-5, atol=2e-6)
