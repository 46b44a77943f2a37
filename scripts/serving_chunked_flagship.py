#!/usr/bin/env python
"""Hardware probe: chunked generate() at flagship geometry on one chip.

An unchunked flagship decode OOMs a single v5e's 16 GB HBM above batch ~16
(docs/PERF.md "Int8 serving decode" measured decode at batch<=16 for that
reason).  generate() now auto-chunks oversized requests
(``auto_max_batch`` -> 15 at 200x95008); this probe issues one batch-N
request (default 48) through the public API with random-init weights —
chunking and HBM behavior are weight-independent — and records per-field
latency.  Run on the real chip:

    python scripts/serving_chunked_flagship.py [--n 48] [--quantize int8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(num_time, num_node, filters):
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from simulgen_vae_tpu.models import LatentConditioner
    from simulgen_vae_tpu.models.vae import VAE

    z_end, hier = 32, 8
    size2 = len(filters) - 1
    vae = VAE(latent_dim=z_end, hierarchical_dim=hier,
              num_filter_enc=list(filters),
              num_filter_dec=list(filters)[::-1],
              num_node=num_node, num_time=num_time, small=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, num_time, num_node))
    vae_vars = {"params": vae.init({"params": key, "sample": key},
                                   x)["params"]}
    lc = LatentConditioner([64, 64], z_end, 4, hier, size2, dropout_rate=0.0)
    lc_vars = lc.init({"params": key, "dropout": key}, jnp.zeros((1, 4)),
                      deterministic=True)
    fake = lambda n: SimpleNamespace(min_=np.zeros(n, np.float32),
                                     scale_=np.full(n, 0.5, np.float32))
    return dict(
        cfg=SimpleNamespace(num_node=num_node),
        vae_model=vae, vae_vars=vae_vars, lc_model=lc, lc_vars=lc_vars,
        lv_scaler=fake(z_end), xs_scaler=fake(size2 * hier),
        data_scaler=fake(num_node),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--time", type=int, default=200, dest="num_time")
    ap.add_argument("--nodes", type=int, default=95008)
    ap.add_argument("--filters", default="1024,512,256,128")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--out",
                    default="docs/artifacts/serving_chunked_flagship.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from simulgen_vae_tpu.generate import auto_max_batch, generate

    filters = [int(f) for f in args.filters.split(",")]
    pipe = build_pipeline(args.num_time, args.nodes, filters)
    chunk = auto_max_batch(args.num_time, args.nodes)
    print(f"auto_max_batch({args.num_time}, {args.nodes}) = {chunk}; "
          f"request batch = {args.n} -> "
          f"{-(-args.n // chunk)} device calls", flush=True)

    rng = np.random.default_rng(0)
    inputs = rng.standard_normal((args.n, 4)).astype(np.float32)

    t0 = time.time()
    fields = generate(pipe, inputs, quantize=args.quantize)
    wall_cold = time.time() - t0        # includes the one compile
    assert fields.shape == (args.n, args.num_time, args.nodes), fields.shape
    assert np.isfinite(fields).all()

    t0 = time.time()
    fields = generate(pipe, inputs, quantize=args.quantize)
    wall_warm = time.time() - t0        # host<->device + decode only

    out = {
        "geometry": f"{args.n}x{args.num_time}x{args.nodes}, "
                    f"filters {args.filters}",
        "backend": jax.default_backend(),
        "quantize": args.quantize,
        "auto_max_batch": chunk,
        "device_calls": -(-args.n // chunk),
        "wall_s_cold": round(wall_cold, 2),
        "wall_s_warm": round(wall_warm, 2),
        "fields_per_s_warm": round(args.n / wall_warm, 1),
        "output_gb": round(fields.nbytes / 1e9, 2),
        "ok": True,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
