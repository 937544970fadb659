"""Where does the r=8 bench config's forward time actually go? (round-3
VERDICT #8: "chase the next MFU step with Pallas only where the profile says
so").

Methodology: bench.py's dependency-chained lax.scan + device_get timing on
ablated variants of the HPNNFast forward — each variant removes ONE stage
(replaced by the cheapest shape-preserving stand-in) so stage cost = full -
ablated. This is coarser than a trace but un-fakeable and runs in minutes.

Stages ablated:
  fold        space_to_depth/depth_to_space (replaced by strided slice + tile)
  stem        separable stem conv (replaced by 1x1 conv)
  head        two separable head convs (replaced by one 1x1 conv)
  norm        final unit-peak normalization (replaced by identity)
  scales      encoder/decoder conv stages (replaced by 1x1 convs)

Prints one JSON line; written to checkpoints/stem_ablation.json by --save.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

import jax.numpy as jnp

from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, load_fast_config


def timed(fn, args_, iters=30, repeats=5):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(a[0] * (1.0 + 1e-12 * carry), *a[1:])
            return jnp.mean(out.astype(jnp.float32)), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    jax.device_get(chained(*args_))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(*args_))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--config", default=None)
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import dataclasses

    cfg = load_fast_config(args.config)
    rhs = jax.random.normal(jax.random.PRNGKey(0), (args.batch, args.n, args.n, 1))
    dx = jnp.full((args.batch, 1), 0.01)

    variants = {
        "full": cfg,
        "no_norm": dataclasses.replace(cfg, output_scaling=None),
        "no_stem": dataclasses.replace(cfg, stem_kernel_size=1),
        "no_head": dataclasses.replace(cfg, head_kernel_size=1),
        "no_scales": dataclasses.replace(cfg, scale_kernel_size=1),
        "thin_head": dataclasses.replace(cfg, head_filters=max(8, cfg.head_filters // 4)),
    }
    out = {"n": args.n, "batch": args.batch}
    for name, vcfg in variants.items():
        model = HPNNFast(vcfg)
        params = model.init(jax.random.PRNGKey(0), rhs[:1], dx[:1])
        t = timed(lambda r, d: model.apply(params, r, d), (rhs, dx))
        out[name] = {
            "ms_per_batch": round(t * 1e3, 4),
            "solves_per_sec": round(args.batch / t, 1),
        }
        print(name, out[name], flush=True)
    full = out["full"]["ms_per_batch"]
    out["stage_cost_ms"] = {
        k: round(full - out[f"no_{k}"]["ms_per_batch"], 4)
        for k in ("norm", "stem", "head", "scales")
    }
    print(json.dumps(out))
    if args.save:
        with open("/root/repo/checkpoints/stem_ablation.json", "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
