#!/usr/bin/env python
"""FULL-pipeline serving latency: host preprocessing included (VERDICT r3 #7).

The bench's generate sweep times the jitted conditioner->decoder graph; a
real serving request also pays the HOST side the reference pays in
``latent_conditioner.py:20-57`` before its model ever runs: PNG decode,
INTER_CUBIC resize to 256x256, binary threshold at 150, /255 normalize,
flatten — then the H2D transfer.  This script measures the whole request
path per batch size:

    read PNGs -> preprocess (cv2) -> device_put -> conditioner -> latent
    descale -> decode -> physical descale -> scalar readback (sync)

and reports p50/p95/p99 for (a) host preprocessing alone, (b) the jitted
graph alone, (c) the end-to-end request, plus the CSV-input variant
(pandas read + MinMaxScaler transform, reference lc.py:100-104) whose host
cost is near zero.  Weights are random-init — latency does not depend on
training.  Run with --quantize int8 for the int8-decoder path.

Usage:
    python scripts/serving_e2e_latency.py [--platform tpu] [--reps 30]
        [--batches 1,16] [--quantize int8] [--json docs/artifacts/...]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IM_SIZE = 256  # reference resize target (latent_conditioner.py:40)


def write_test_pngs(directory: str, n: int, raw_px: int = 700) -> list:
    """Synthetic outline PNGs at a realistic raw resolution (the reference's
    example images are camera/CAD exports, larger than 256^2)."""
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = np.zeros((raw_px, raw_px), np.uint8)
        # a few random filled ellipses -> nontrivial outline after threshold
        for _ in range(3):
            c = rng.integers(raw_px // 4, 3 * raw_px // 4, 2)
            ax = rng.integers(raw_px // 10, raw_px // 3, 2)
            cv2.ellipse(img, (int(c[0]), int(c[1])),
                        (int(ax[0]), int(ax[1])), float(rng.uniform(0, 180)),
                        0, 360, int(rng.integers(120, 255)), -1)
        p = os.path.join(directory, f"req_{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def preprocess_images(paths) -> np.ndarray:
    """The reference's exact host path: grayscale read -> INTER_CUBIC resize
    -> threshold 150 -> /255 -> flatten (data/images.py, cli.py:325)."""
    import cv2

    from simulgen_vae_tpu.data.images import clear_images

    out = np.zeros((len(paths), IM_SIZE * IM_SIZE), np.float32)
    for i, p in enumerate(paths):
        im = cv2.imread(p, 0)
        resized = cv2.resize(im, (IM_SIZE, IM_SIZE),
                             interpolation=cv2.INTER_CUBIC)
        out[i] = (clear_images(resized).astype(np.float32) / 255.0).ravel()
    return out


def build_pipeline(on_tpu: bool):
    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.config import LCConfig, VAEConfig
    from simulgen_vae_tpu.data.scaler import MinMaxScaler
    from simulgen_vae_tpu.models import LatentConditionerImg, VAE

    if on_tpu:
        node, t, filters = 95008, 200, [1024, 512, 256, 128]
    else:
        node, t, filters = 2048, 50, [64, 32, 16, 8]
    cfg = VAEConfig(num_param=64, num_time=t, num_node=node,
                    latent_dim_end=32, latent_dim=8, num_filter_enc=filters,
                    small=True, n_epochs=1, batch_size=16, lr=1e-3,
                    alpha=1e6, dtype="bfloat16" if on_tpu else "float32")
    lc_cfg = LCConfig()
    vae_model = VAE(latent_dim=32, hierarchical_dim=8,
                    num_filter_enc=filters, num_filter_dec=filters[::-1],
                    num_node=node, num_time=t, small=True,
                    dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, node)).astype(np.float32) * .3,
                    vae_model.dtype)
    vae_vars = {"params": vae_model.init({"params": key, "sample": key},
                                         x)["params"]}

    size2 = len(filters) - 1
    lc_model = LatentConditionerImg(lc_cfg.filters, 32, 8, size2,
                                    dropout_rate=0.0, use_attention=True)
    lc_vars = dict(lc_model.init({"params": key, "dropout": key},
                                 jnp.zeros((1, IM_SIZE * IM_SIZE)),
                                 deterministic=True))

    def affine_scaler(dim):
        s = MinMaxScaler(feature_range=(-0.7, 0.7))
        s.fit(rng.standard_normal((8, dim)).astype(np.float32))
        return s

    return dict(cfg=cfg, lc_cfg=lc_cfg, vae_model=vae_model,
                vae_vars=vae_vars, lc_model=lc_model, lc_vars=lc_vars,
                lv_scaler=affine_scaler(32), xs_scaler=affine_scaler(size2 * 8),
                data_scaler=affine_scaler(node)), (node, t)


def percentiles(ms):
    ms = np.asarray(ms)
    return {"p50_ms": round(float(np.percentile(ms, 50)), 2),
            "p95_ms": round(float(np.percentile(ms, 95)), 2),
            "p99_ms": round(float(np.percentile(ms, 99)), 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batches", default="1,16")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from simulgen_vae_tpu.generate import make_generate_fn

    on_tpu = jax.default_backend() == "tpu"
    reps = args.reps if on_tpu else min(args.reps, 8)
    pipeline, (node, t) = build_pipeline(on_tpu)
    fn = make_generate_fn(pipeline, descale_output=True,
                          quantize=args.quantize)

    results = {"geometry": f"{t}x{node} "
                           f"{'bf16' if on_tpu else 'f32'}"
                           f"{' int8-decoder' if args.quantize else ''}",
               "reps": reps, "batches": {}}
    with tempfile.TemporaryDirectory() as td:
        for batch in (int(b) for b in args.batches.split(",")):
            paths = write_test_pngs(td, batch)
            # warm: compile + cv2 first-call setup
            inp = preprocess_images(paths)
            field = fn(jnp.asarray(inp))
            _ = float(field[0, 0, 0])

            host_ms, graph_ms, e2e_ms = [], [], []
            dev_inp = jnp.asarray(inp)
            for _ in range(reps):
                t0 = time.perf_counter()
                x = preprocess_images(paths)
                host_ms.append((time.perf_counter() - t0) * 1e3)

                t0 = time.perf_counter()
                f = fn(dev_inp)
                _ = float(f[0, 0, 0])
                graph_ms.append((time.perf_counter() - t0) * 1e3)

                t0 = time.perf_counter()
                x = preprocess_images(paths)
                f = fn(jnp.asarray(x))
                _ = float(f[0, 0, 0])
                e2e_ms.append((time.perf_counter() - t0) * 1e3)

            # CSV-input variant host cost: a [batch, 8]-param row through the
            # MinMaxScaler affine — measure transform only (the conditioner
            # in CSV mode is the MLP; graph cost is of the same order).
            sc = pipeline["lv_scaler"]
            row = np.random.default_rng(1).standard_normal(
                (batch, 32)).astype(np.float32)
            csv_ms = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = row * sc.scale_ + sc.min_
                csv_ms.append((time.perf_counter() - t0) * 1e3)

            e2e = percentiles(e2e_ms)
            results["batches"][batch] = {
                "host_preprocess": percentiles(host_ms),
                "jitted_graph": percentiles(graph_ms),
                "end_to_end": e2e,
                "csv_scale_host": percentiles(csv_ms),
                "e2e_samples_per_sec": round(batch / e2e["p50_ms"] * 1e3, 1),
            }
            print(f"batch {batch}: {json.dumps(results['batches'][batch])}",
                  flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")
    print(json.dumps({k: v for k, v in results.items() if k != 'batches'}))


if __name__ == "__main__":
    main()
