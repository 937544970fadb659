"""Speed-of-light component profile of the bench-config HPNNFast forward.

The stage ablation (`scripts/bench_stem_ablation.py`, checkpoints/
stem_ablation.json) accounts for only ~1.25ms of the 2.66ms forward at
256^2x128: kernel-size ablations keep the 1x1 convs, FiLM, resizes, the
space-to-depth fold, the positional-embedding concat and the output tail.
This script times each of those *components in isolation* at the exact bench
shapes so the optimization target is chosen by measurement (round-3 VERDICT
#8's "Pallas only where the profile says so").

Prints one JSON line; --save writes checkpoints/component_profile.json.
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

import flax.linen as nn
import jax.numpy as jnp

from poisson_cnn_tpu.models.hpnn_fast import (
    HPNNFast,
    SeparableConv,
    depth_to_space,
    load_fast_config,
    space_to_depth,
)
from poisson_cnn_tpu.ops import (
    cos_position_embeddings,
    resize_align_corners,
    set_max_magnitude_in_batch,
)


def timed(fn, args_, iters_lo=100, iters_hi=400, repeats=5):
    """Slope-based dependency-chained scan timing: per-iteration cost is the
    SLOPE between two chain lengths, (t_hi - t_lo) / (iters_hi - iters_lo).

    A single chained call pays a fixed ~24ms host<->device round trip on the
    tunneled axon backend (measured: astype @ (128,256,256) costs "2.5ms/iter"
    at length 10, "0.12ms/iter" at length 800 — pure fixed-overhead dilution).
    Dividing one call's wall time by its length (the old method, and bench.py
    at small --iters) overstates every sub-millisecond component by
    overhead/iters; the slope cancels the fixed cost exactly. Iteration i+1's
    first input is perturbed by iteration i's output mean, so nothing elides."""

    def best_time(iters):
        @jax.jit
        def chained(*a):
            def body(carry, _):
                # cast back: carry is f32, and a bf16 input silently promoting
                # to f32 adds a full-size upcast+downcast bandwidth pass that
                # can dominate a small component's measurement
                perturbed = (a[0] * (1.0 + 1e-12 * carry)).astype(a[0].dtype)
                out = fn(perturbed, *a[1:])
                return jnp.mean(out.astype(jnp.float32)), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return carry

        jax.device_get(chained(*args_))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.device_get(chained(*args_))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_time(iters_lo), best_time(iters_hi)
    return max(t_hi - t_lo, 0.0) / (iters_hi - iters_lo) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    cfg = load_fast_config()
    r = cfg.input_space_to_depth
    n, B = args.n, args.batch
    h = n // r  # post-fold resolution (32 at n=256, r=8)
    key = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16

    out = {
        "n": n,
        "batch": B,
        "r": r,
        "config": "checkpoints/hpnn_fast/config.json",
        "components_ms": {},
    }
    C = out["components_ms"]

    # --- input side -------------------------------------------------------
    rhs = jax.random.normal(key, (B, n, n, 1), jnp.float32)
    C["input_astype_bf16"] = timed(lambda x: x.astype(bf16), (rhs,))

    rhs16 = rhs.astype(bf16)
    pos = cos_position_embeddings((n, n), dtype=bf16)

    def concat_pos(x):
        return jnp.concatenate(
            [x, jnp.broadcast_to(pos[None], (B,) + pos.shape)], -1
        )

    C["pos_concat_fullres"] = timed(concat_pos, (rhs16,))

    x3 = concat_pos(rhs16)
    C["fold_3ch"] = timed(lambda x: space_to_depth(x, r), (x3,))
    C["fold_1ch"] = timed(lambda x: space_to_depth(x, r), (rhs16,))

    # fused alternative: fold rhs alone, interleave with the constant folded
    # pos embeddings at low res (identical channel order to fold-after-concat)
    posf = space_to_depth(concat_pos(jnp.zeros_like(rhs16))[:1, :, :, 1:], r)

    def fold_then_interleave(x):
        xf = space_to_depth(x, r)  # (B,h,w,r^2)
        xf = xf.reshape(B, h, h, r * r, 1)
        pf = jnp.broadcast_to(posf.reshape(1, h, h, r * r, 2), (B, h, h, r * r, 2))
        return jnp.concatenate([xf, pf], -1).reshape(B, h, h, r * r * 3)

    C["fold1ch_plus_lowres_interleave"] = timed(fold_then_interleave, (rhs16,))

    # --- stem / head / scales at their true channel widths ----------------
    xin = jax.random.normal(key, (B, h, h, 3 * r * r), bf16)
    stem = SeparableConv(cfg.stem_filters, cfg.stem_kernel_size, cfg.activation,
                         dtype=bf16)
    sp = stem.init(key, xin)
    C["stem_separable"] = timed(lambda x: stem.apply(sp, x), (xin,))

    hfeat = jax.random.normal(key, (B, h, h, 2 * cfg.stem_filters), bf16)
    head = SeparableConv(cfg.head_filters, cfg.head_kernel_size, cfg.activation,
                         dtype=bf16)
    hp = head.init(key, hfeat)
    C["head_separable_one"] = timed(lambda x: head.apply(hp, x), (hfeat,))

    # --- decoder resizes (bilinear matmuls) -------------------------------
    f_lo = jax.random.normal(key, (B, h // 4, h // 4, cfg.scale_filters[-1]), bf16)
    C["resize_8to16_128ch"] = timed(
        lambda x: resize_align_corners(x, (h // 2, h // 2), "bilinear"), (f_lo,)
    )
    f_mid = jax.random.normal(key, (B, h // 2, h // 2, cfg.scale_filters[0]), bf16)
    C["resize_16to32_128ch"] = timed(
        lambda x: resize_align_corners(x, (h, h), "bilinear"), (f_mid,)
    )

    # --- output tail -------------------------------------------------------
    feat = jax.random.normal(key, (B, h, h, cfg.head_filters), bf16)
    proj = nn.Conv(r * r, (1, 1), dtype=bf16)
    pp = proj.init(key, feat)
    C["out_proj_1x1_to_r2"] = timed(lambda x: proj.apply(pp, x), (feat,))

    folded_out = jax.random.normal(key, (B, h, h, r * r), bf16)
    C["depth_to_space"] = timed(lambda x: depth_to_space(x, r), (folded_out,))

    full = jax.random.normal(key, (B, n, n, 1), bf16)

    def bc_tail(x):
        inner = x[:, 1:-1, 1:-1, :]
        y = jnp.pad(inner, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
        return set_max_magnitude_in_batch(y, 1.0, eps=1e-30)

    C["bc_crop_pad_plus_unitpeak_f32"] = timed(bc_tail, (full,))

    # --- whole model for scale --------------------------------------------
    model = HPNNFast(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(key, jnp.ones((1, n, n, 1)), jnp.full((1, 1), 0.01))
    params = jax.device_put(params, jax.devices()[0])
    dx = jnp.full((B, 1), 2.0 / (n - 1))
    C["FULL_MODEL"] = timed(lambda x, d: model.apply(params, x, d), (rhs, dx))

    # speed-of-light context: minimal HBM traffic at ~819 GB/s (v5e)
    bytes_min = B * n * n * (4 + 4)  # read rhs f32 + write out f32
    out["sol_ms_hbm_roundtrip"] = round(bytes_min / 819e9 * 1e3, 4)
    out["components_ms"] = {k: round(v, 4) for k, v in C.items()}
    print(json.dumps(out))
    if args.save:
        with open("/root/repo/checkpoints/component_profile.json", "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
