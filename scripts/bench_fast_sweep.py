"""Architecture sweep for the HPNN-Fast benchmark config (round-3 VERDICT #6:
push single-chip MFU past 30% / ~31k solves/sec @256^2).

Measures each candidate with bench.py's exact un-fakeable methodology (chained
lax.scan, device_get fetch, XLA-cost-analysis FLOP cross-check) on random
params — architecture throughput only; the winner gets retrained for the
accuracy row before it becomes the shipped bench config.

Round-2 diagnosis (VERDICT weak #1): 16-channel convs at 128^2 use 16/128 MXU
lanes; the full-resolution separable stem/head is bandwidth-bound. Candidates
therefore move capacity to deeper space-to-depth factors (r=4: stem at 64^2
with 4x channels) and >=64-channel pyramid scales.

Usage: python scripts/bench_fast_sweep.py [--n 256] [--batch 128]
"""

import argparse
import dataclasses
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

sys.path.insert(0, "/root/repo")
from bench import _graph_flops, _peak_flops
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig

BASE = dict(output_scaling="soln_max_magnitude")

CANDIDATES = {
    # round-2 shipped config (trained artifact hpnn_fast_fullrange)
    "r2_baseline": HPNNFastConfig(**BASE),
    # deeper fold: stem at n/4 with 4x channels, wide pyramid
    "r4_wide": HPNNFastConfig(
        input_space_to_depth=4, stem_filters=32,
        scale_filters=(64, 96, 128), head_filters=32, **BASE,
    ),
    "r4_wide_deep": HPNNFastConfig(
        input_space_to_depth=4, stem_filters=32,
        scale_filters=(64, 96, 128, 128), head_filters=32, **BASE,
    ),
    "r4_x128": HPNNFastConfig(
        input_space_to_depth=4, stem_filters=64,
        scale_filters=(128, 128, 128), head_filters=64, **BASE,
    ),
    "r8_wide": HPNNFastConfig(
        input_space_to_depth=8, stem_filters=64,
        scale_filters=(128, 128), head_filters=64,
        stem_kernel_size=7, head_kernel_size=7, **BASE,
    ),
    # keep r2 but widen everything (tests the lane-waste hypothesis directly)
    "r2_wide": HPNNFastConfig(
        stem_filters=32, scale_filters=(64, 96, 128, 128),
        head_filters=32, **BASE,
    ),
    # round-3 second wave, bracketing the r8_wide winner (49.7k @ 31% MFU):
    # deeper fold — stem at n/16 with 256 input channels; highest arithmetic
    # intensity of the family, receptive field per conv tap spans 16 px
    "r16_wide": HPNNFastConfig(
        input_space_to_depth=16, stem_filters=128,
        scale_filters=(256,), head_filters=128,
        stem_kernel_size=7, head_kernel_size=7, **BASE,
    ),
    "r16_slim": HPNNFastConfig(
        input_space_to_depth=16, stem_filters=96,
        scale_filters=(128,), head_filters=96,
        stem_kernel_size=5, head_kernel_size=5, **BASE,
    ),
    # thinner r8 — ~40% FLOP cut vs r8_wide; wins if MFU holds above ~25%
    "r8_thin": HPNNFastConfig(
        input_space_to_depth=8, stem_filters=48,
        scale_filters=(96, 96), head_filters=48,
        stem_kernel_size=7, head_kernel_size=7, **BASE,
    ),
    # r8 with 5-tap separable stem/head (stem/head are the full-res cost)
    "r8_k5": HPNNFastConfig(
        input_space_to_depth=8, stem_filters=64,
        scale_filters=(128, 128), head_filters=64,
        stem_kernel_size=5, head_kernel_size=5, **BASE,
    ),
}


def bench_one(cfg, n, batch, iters=32, repeats=3):
    model = HPNNFast(cfg)
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    rhs = jnp.ones((batch, n, n, 1), dtype=jnp.float32)
    dx = jnp.full((batch, 1), 2.0 / (n - 1), dtype=jnp.float32)
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, n, n, 1)), jnp.full((1, 1), 0.01)
        )
    params = jax.device_put(params, dev)

    def fwd(params, rhs, dx):
        return model.apply(params, rhs, dx)

    flops = _graph_flops(fwd, params, rhs, dx)

    @jax.jit
    def chained(params, rhs, dx):
        def body(carry, _):
            out = fwd(params, rhs * (1.0 + 1e-12 * carry), dx)
            return jnp.mean(out.astype(jnp.float32)), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    jax.device_get(chained(params, rhs, dx))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(params, rhs, dx))
        best = min(best, time.perf_counter() - t0)
    sps = batch * iters / best
    implied = flops * iters / best
    peak = _peak_flops(dev)
    if flops and implied > peak:
        raise SystemExit(f"invalid timing: {implied/1e12:.1f} > peak")
    return {
        "solves_per_sec": round(sps, 1),
        "gflop_per_solve": round(flops / batch / 1e9, 3),
        "implied_tflops": round(implied / 1e12, 2),
        "mfu": round(implied / peak, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    results = {}
    for name, cfg in CANDIDATES.items():
        if args.only and name not in args.only:
            continue
        r = bench_one(cfg, args.n, args.batch)
        results[name] = r
        print(name, json.dumps(r), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
