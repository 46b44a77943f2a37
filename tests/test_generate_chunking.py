"""Chunked serving: generate() splits oversized batches transparently.

At flagship geometry one decoded field is ~76 MB f32, so an unchunked
batch-64 decode OOMs a single v5e's HBM (the reference never hits this —
it decodes sample-at-a-time through host round trips,
reconstruction_evaluator.py:160-178).  generate() auto-sizes a per-call
chunk, pads the tail chunk to the one compiled shape, and stitches the
results; these tests pin the equality and the auto-sizing.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulgen_vae_tpu.generate import auto_max_batch, generate
from simulgen_vae_tpu.models import LatentConditioner
from simulgen_vae_tpu.models.vae import VAE


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
    fake = lambda n: SimpleNamespace(min_=np.zeros(n, np.float32),
                                     scale_=np.full(n, 0.5, np.float32))
    return dict(
        cfg=SimpleNamespace(num_node=node),
        vae_model=vae, vae_vars=vae_vars, lc_model=lc, lc_vars=lc_vars,
        lv_scaler=fake(z_end), xs_scaler=fake(size2 * hier),
        data_scaler=fake(node),
    )


def _inputs(batch):
    rng = np.random.default_rng(1)
    return rng.standard_normal((batch, 4)).astype(np.float32)


def test_chunked_matches_unchunked(pipeline):
    x = _inputs(7)
    whole = generate(pipeline, x)                    # auto -> one call here
    parts = generate(pipeline, x, max_batch=3)       # 3 + 3 + padded tail
    assert whole.shape == (7, 10, 64)
    np.testing.assert_allclose(parts, whole, rtol=1e-5, atol=1e-6)


def test_exact_multiple_no_padding(pipeline):
    x = _inputs(6)
    np.testing.assert_allclose(generate(pipeline, x, max_batch=2),
                               generate(pipeline, x), rtol=1e-5, atol=1e-6)


def test_auto_max_batch_flagship_fits_hbm():
    # flagship field geometry (SURVEY: 200x95008) must land in the band the
    # hardware probe validated: >16 OOMs, 1 would serialize needlessly.
    assert 8 <= auto_max_batch(200, 95008) <= 16
    # tiny geometries are effectively unchunked
    assert auto_max_batch(10, 64) > 10_000


def test_cli_flag_parses(pipeline, tmp_path, monkeypatch):
    # --max_batch reaches generate(): with max_batch=1 a 3-row CSV still
    # produces 3 fields (chunk loop + tail slice, no shape leakage).
    x = _inputs(3)
    out = generate(pipeline, x, max_batch=1)
    assert out.shape == (3, 10, 64)
