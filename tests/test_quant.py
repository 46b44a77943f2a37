"""Int8 serving quantization (ops/quant.py + the quant hooks in blocks.py).

Covers: per-channel weight round-trip, int8 dot/conv vs float reference,
the flax "quant" collection dispatch in the linear cores, and the full
quantized generate path staying close to the float decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulgen_vae_tpu.ops.quant import (
    build_quant_collection,
    int8_conv1d_same,
    int8_dot,
    quantize_kernel,
)


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 64, 32)).astype(np.float32)
    w[:, :, 5] *= 40.0  # per-channel scaling must absorb outlier columns
    kq, s = quantize_kernel(w)
    assert kq.dtype == np.int8 and s.shape == (32,)
    w_hat = kq.astype(np.float32) * s
    err = np.abs(w_hat - w).max(axis=(0, 1)) / np.abs(w).max(axis=(0, 1))
    assert err.max() < 1.0 / 127  # symmetric rounding bound per channel


def test_quantize_kernel_zero_column_safe():
    w = np.zeros((1, 8, 4), np.float32)
    kq, s = quantize_kernel(w)
    assert np.all(kq == 0) and np.all(np.isfinite(s))


def test_int8_dot_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 20, 64)).astype(np.float32))
    w = rng.standard_normal((64, 48)).astype(np.float32)
    kq, s = quantize_kernel(w)
    y = int8_dot(x, jnp.asarray(kq), jnp.asarray(s))
    ref = np.asarray(x) @ w
    rel = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


@pytest.mark.parametrize("k", [1, 3, 5])
def test_int8_conv_close_to_f32(k):
    from simulgen_vae_tpu.models.blocks import conv1d_same

    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    w = rng.standard_normal((k, 32, 24)).astype(np.float32)
    kq, s = quantize_kernel(w)
    y = int8_conv1d_same(x, jnp.asarray(kq), jnp.asarray(s))
    ref = np.asarray(conv1d_same(x, jnp.asarray(w)))
    rel = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def test_int8_dot_per_row_scales_survive_outlier_row():
    """One huge row must not inflate every other row's quantization step.

    This is the regression the per-row activation scales fix: with a single
    per-TENSOR scale, a 100x outlier row costs the small rows ~2 bits of
    mantissa and the flagship-filter decode measured recon-MSE ratio 1.10
    (docs/PERF.md 'Int8 serving decode'); per-row scales keep every row's
    relative error at the symmetric-rounding bound."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    x[3] *= 100.0  # outlier row
    w = rng.standard_normal((64, 48)).astype(np.float32)
    kq, s = quantize_kernel(w)
    y = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(kq), jnp.asarray(s)))
    ref = x @ w
    # per-ROW relative error: small rows stay accurate despite row 3
    row_rel = (np.linalg.norm(y - ref, axis=-1)
               / np.linalg.norm(ref, axis=-1))
    assert row_rel.max() < 0.02, row_rel


def test_conv_core_quant_collection_dispatch():
    from simulgen_vae_tpu.models.blocks import Conv1d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    m = Conv1d(12, 3)
    variables = m.init(jax.random.PRNGKey(0), x)
    y_f32 = m.apply(variables, x)
    quant = build_quant_collection(variables["params"])
    y_q = m.apply({"params": variables["params"], "quant": quant}, x)
    rel = (np.linalg.norm(np.asarray(y_q) - np.asarray(y_f32))
           / np.linalg.norm(np.asarray(y_f32)))
    assert 0 < rel < 0.03, rel  # quant path engaged AND close


def test_build_quant_collection_mirrors_paths():
    params = {
        "dec_block_0": {"Conv1d_0": {"Conv_0": {
            "kernel": np.ones((1, 8, 4), np.float32),
            "bias": np.zeros(4, np.float32)}}},
        "norm": {"scale": np.ones(4, np.float32)},
    }
    q = build_quant_collection(params)
    leaf = q["dec_block_0"]["Conv1d_0"]["Conv_0"]
    assert set(leaf) == {"kernel_q", "kernel_s"}
    assert "norm" not in q  # no kernels below -> pruned


@pytest.mark.slow
def test_quantized_generate_close_to_float():
    """Whole decoder through the quant path: VAE.generate with a 'quant'
    collection stays close to the float decode (random weights — the
    trained-model quality measurement lives in scripts/probe_quant_serving
    and docs/PERF.md)."""
    from simulgen_vae_tpu.models.vae import VAE

    filters = [32, 16, 8]
    model = VAE(latent_dim=8, hierarchical_dim=4, num_filter_enc=filters,
                num_filter_dec=filters[::-1], num_node=64, num_time=12,
                small=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)).astype(np.float32) * .3)
    variables = model.init({"params": key, "sample": key}, x)

    z = jnp.asarray(np.tanh(rng.standard_normal((3, 8))).astype(np.float32))
    xs = [jnp.asarray(np.tanh(rng.standard_normal((3, 4))).astype(np.float32))
          for _ in range(len(filters) - 1)]
    gen = lambda v: model.apply(v, z, xs, method=VAE.generate,
                                rngs={"sample": key})
    f_ref = np.asarray(gen({"params": variables["params"]}))
    quant = {"decoder": build_quant_collection(
        variables["params"]["decoder"])}
    f_q = np.asarray(gen({"params": variables["params"], "quant": quant}))
    rel = np.linalg.norm(f_q - f_ref) / max(np.linalg.norm(f_ref), 1e-9)
    assert rel < 0.05, rel
    assert not np.allclose(f_q, f_ref)  # the int8 path actually ran


def test_resolve_quantize_auto_maps_by_backend():
    """'auto' turns int8 on only on TPU backends (the gate that justified
    default-on ran on flagship-trained weights — docs/PERF.md)."""
    import jax

    from simulgen_vae_tpu.generate import resolve_quantize

    expected = "int8" if jax.default_backend() == "tpu" else None
    assert resolve_quantize("auto") == expected  # CPU under conftest
    assert resolve_quantize("none") is None
    assert resolve_quantize(None) is None
    assert resolve_quantize("int8") == "int8"


def _tiny_pipeline():
    """Minimal generate() pipeline (mirrors tests/test_generate_mesh.py)."""
    from types import SimpleNamespace

    from simulgen_vae_tpu.models import LatentConditioner
    from simulgen_vae_tpu.models.vae import VAE

    def fake_scaler(n):
        return SimpleNamespace(min_=np.zeros(n, np.float32),
                               scale_=np.full(n, 0.5, np.float32))

    node, t, z_end, hier, size2 = 64, 10, 8, 4, 1
    filters = [16, 8]
    vae = VAE(latent_dim=z_end, hierarchical_dim=hier,
              num_filter_enc=filters, num_filter_dec=filters[::-1],
              num_node=node, num_time=t, small=True)
    key = jax.random.PRNGKey(0)
    vae_vars = {"params": vae.init({"params": key, "sample": key},
                                   jnp.zeros((2, t, node)))["params"]}
    lc = LatentConditioner([8, 8], z_end, 4, hier, size2, dropout_rate=0.0)
    lc_vars = lc.init({"params": key, "dropout": key}, jnp.zeros((1, 4)),
                      deterministic=True)
    from types import SimpleNamespace as NS
    return dict(cfg=NS(num_node=node), vae_model=vae, vae_vars=vae_vars,
                lc_model=lc, lc_vars=lc_vars, lv_scaler=fake_scaler(z_end),
                xs_scaler=fake_scaler(size2 * hier),
                data_scaler=fake_scaler(node))


def _corrupt_kernels(tree, factor=100.0, rows=2):
    """Plant outlier rows in every conv kernel: per-output-channel symmetric
    quantization then loses ~7 bits on the remaining weights of each channel
    (step scales with the channel max), so the int8 decode diverges
    (rel-L2 ~0.25 measured on this geometry) while the float decode is
    fine.  ~100x outliers maximize the damage — much larger and the
    outliers dominate the float output too (both paths agree again)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _corrupt_kernels(v, factor, rows)
        elif k == "kernel":
            w = np.array(v)
            flat = w.reshape(-1, w.shape[-1])
            flat[:rows] *= factor
            out[k] = jnp.asarray(flat.reshape(w.shape))
        else:
            out[k] = v
    return out


def test_int8_self_check_passes_and_serves_int8(monkeypatch):
    """quantize='auto' on a well-behaved model: gate passes, the int8
    decode is actually used (differs from float), verdict cached."""
    import simulgen_vae_tpu.generate as gen_mod

    monkeypatch.setattr(gen_mod, "resolve_quantize", lambda m: "int8")
    pipe = _tiny_pipeline()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 4)).astype(np.float32)
    out_auto = gen_mod.generate(pipe, x, quantize="auto")
    ok, rel = pipe["_int8_check"]
    assert ok and 0 < rel <= 0.05, (ok, rel)
    out_f = np.asarray(gen_mod._cached_fn(pipe, True, None)(jnp.asarray(x)))
    out_q = np.asarray(gen_mod._cached_fn(pipe, True, "int8")(jnp.asarray(x)))
    np.testing.assert_array_equal(out_auto, out_q)
    assert not np.allclose(out_auto, out_f)  # int8 path engaged


def test_int8_self_check_falls_back_on_outlier_model(monkeypatch, caplog):
    """The VERDICT r4 #4 scenario: a deliberately outlier-weighted decoder
    fails the per-model gate -> auto serves FLOAT with a warning instead of
    silently degrading."""
    import logging

    import simulgen_vae_tpu.generate as gen_mod

    monkeypatch.setattr(gen_mod, "resolve_quantize", lambda m: "int8")
    pipe = _tiny_pipeline()
    pipe["vae_vars"] = {"params": {
        "encoder": pipe["vae_vars"]["params"]["encoder"],
        "decoder": _corrupt_kernels(pipe["vae_vars"]["params"]["decoder"]),
    }}
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 4)).astype(np.float32)
    with caplog.at_level(logging.WARNING, "simulgen_vae_tpu.generate"):
        out_auto = gen_mod.generate(pipe, x, quantize="auto")
    ok, rel = pipe["_int8_check"]
    assert not ok and rel > 0.05, (ok, rel)
    assert any("int8 self-check FAILED" in r.message for r in caplog.records)
    out_f = np.asarray(gen_mod._cached_fn(pipe, True, None)(jnp.asarray(x)))
    np.testing.assert_array_equal(out_auto, out_f)  # served float
