"""VERDICT r3 #8: chase the next MFU step with Pallas only where the profile
says so — and commit the measurement either way.

`checkpoints/component_profile.json` localizes the biggest single forward
component of the bench config (r=8, 256^2, batch 128) to the separable stem:
0.60ms isolated of a 1.74ms full forward. Its math (PadConv k x 1 then
1 x k, both linear, leaky_relu at the end — `models/hpnn_fast.py:95-113`)
admits exact-identical reformulations; this script measures them at the
EXACT bench shapes with the slope-based chained timer (fixed ~24ms dispatch
overhead cancels) and checks numerical agreement:

  A. baseline     — flax SeparableConv as the model runs it today
  B. shift-matmul — each k-tap conv as k shifted (N,C_in)@(C_in,C_out) dots
                    (hand-written im2col-free lowering; XLA fuses the shifts)
  C. pallas-fused — one kernel: both convs + biases + leaky_relu with the
                    intermediate held in VMEM (never round-trips HBM)

Writes checkpoints/stem_fusion.json. A negative result is a result.
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

import jax.numpy as jnp

from bench_component_profile import timed
from poisson_cnn_tpu.models.hpnn_fast import SeparableConv, load_fast_config


def leaky_relu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def extract_stem_weights(params):
    """(W1 (k,Cin,F), b1 (F,), W2 (k,F,F), b2 (F,)) from SeparableConv params."""
    p0 = params["params"]["PadConv_0"]["Conv_0"]
    p1 = params["params"]["PadConv_1"]["Conv_0"]
    w1 = p0["kernel"]  # (k,1,Cin,F)
    w2 = p1["kernel"]  # (1,k,F,F)
    return (
        jnp.squeeze(w1, axis=1),
        p0["bias"],
        jnp.squeeze(w2, axis=0),
        p1["bias"],
    )


def stem_shift_matmul(x, w1, b1, w2, b2):
    """Exact SeparableConv math as shifted dots. x: (B,H,W,Cin) -> (B,H,W,F)."""
    k = w1.shape[0]
    lo, hi = (k - 1) // 2, k // 2
    B, H, W, _ = x.shape
    F = w1.shape[-1]
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0), (0, 0)))
    y = jnp.zeros((B, H, W, F), jnp.float32)
    for t in range(k):
        y = y + jnp.dot(
            xp[:, t : t + H], w1[t], preferred_element_type=jnp.float32
        )
    y = (y + b1).astype(x.dtype)
    yp = jnp.pad(y, ((0, 0), (0, 0), (lo, hi), (0, 0)))
    z = jnp.zeros((B, H, W, F), jnp.float32)
    for t in range(k):
        z = z + jnp.dot(
            yp[:, :, t : t + W], w2[t], preferred_element_type=jnp.float32
        )
    z = (z + b2).astype(x.dtype)
    return leaky_relu(z)


def make_pallas_stem(H, W, Cin, F, k, blk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo = (k - 1) // 2

    def kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, y_ref, acc_ref):
        # conv along H: y[b,i,j,f] = sum_t xp[b,i+t,j,:] @ w1[t]
        # weights arrive stacked 2-D ((k*Cin,F) / (k*F,F)); accumulate into a
        # f32 scratch ref so only one dot intermediate is live at a time
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for t in range(k):
            xs = xp_ref[:, t : t + H, :, :].reshape(blk * H * W, Cin)
            acc_ref[:] += jnp.dot(
                xs, w1_ref[t * Cin : (t + 1) * Cin, :],
                preferred_element_type=jnp.float32,
            )
        y = (acc_ref[:].reshape(blk, H, W, F) + b1_ref[0]).astype(out_ref.dtype)
        # conv along W on the VMEM-resident intermediate; scratch-ref padding
        # (in-kernel jnp.pad is what Mosaic's remote compiler 500'd on)
        y_ref[:] = jnp.zeros_like(y_ref)
        y_ref[:, :, lo : lo + W, :] = y
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for t in range(k):
            ys = y_ref[:, :, t : t + W, :].reshape(blk * H * W, F)
            acc_ref[:] += jnp.dot(
                ys, w2_ref[t * F : (t + 1) * F, :],
                preferred_element_type=jnp.float32,
            )
        # leaky-relu on the f32 accumulator BEFORE the bf16 downcast: a
        # where/select on bf16 values crashes this Mosaic remote compiler
        # (bisected: identical kernels compile with f32 where, die with bf16)
        z = acc_ref[:].reshape(blk, H, W, F) + b2_ref[0]
        out_ref[:] = jnp.where(z >= 0, z, 0.01 * z).astype(out_ref.dtype)

    @jax.jit
    def run(x, w1, b1, w2, b2):
        B = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (lo, k - 1 - lo), (0, 0), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec(
                    (blk, H + k - 1, W, Cin), lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (blk, H, W, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W, F), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((blk, H, W + k - 1, F), x.dtype),
                pltpu.VMEM((blk * H * W, F), jnp.float32),
            ],
        )(
            xp,
            w1.reshape(k * Cin, F),
            b1.reshape(1, F),
            w2.reshape(k * F, F),
            b2.reshape(1, F),
        )

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--blk", type=int, default=4)
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--skip-ab", action="store_true",
                    help="time only the pallas variant (merge into saved json)")
    args = ap.parse_args()

    cfg = load_fast_config()
    if cfg.activation != "leaky_relu":
        # variants B/C hardcode leaky_relu(0.01); a different activation would
        # make the timing comparison apples-to-oranges
        raise SystemExit(
            f"bench config activation is {cfg.activation!r}; variants B/C "
            "assume 'leaky_relu' — refusing to produce a mismatched comparison"
        )
    r = cfg.input_space_to_depth
    H = W = args.n // r
    Cin = 3 * r * r
    F = cfg.stem_filters
    k = cfg.stem_kernel_size
    B = args.batch
    if B % args.blk != 0:
        raise SystemExit(
            f"--batch {B} must be divisible by --blk {args.blk}: the Pallas "
            "grid is (B // blk,) and a remainder would leave trailing output "
            "rows unwritten (silently corrupting diff and timing)"
        )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)

    stem = SeparableConv(F, k, cfg.activation, dtype=jnp.bfloat16)
    params = stem.init(key, x)
    w1, b1, w2, b2 = extract_stem_weights(params)

    out = {
        "n": args.n, "batch": B, "shape": [B, H, W, Cin], "filters": F,
        "kernel": k, "blk": args.blk, "variants_ms": {}, "max_abs_diff": {},
    }

    ref = stem.apply(params, x)
    path = "/root/repo/checkpoints/stem_fusion.json"
    if args.skip_ab and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        out["variants_ms"].update(prev.get("variants_ms", {}))
        out["max_abs_diff"].update(prev.get("max_abs_diff", {}))
        # drop stale C entries from BOTH dicts: if the fresh Pallas run fails
        # below, the saved JSON must not pair a stale C diff with a new error
        out["variants_ms"].pop("C_pallas_fused", None)
        out["max_abs_diff"].pop("C_pallas_fused", None)
    elif args.skip_ab:
        print(
            f"WARNING: --skip-ab but {path} does not exist; the output will "
            "have no A/B timings",
            file=sys.stderr,
        )
    else:
        out["variants_ms"]["A_separable_flax"] = round(
            timed(lambda v: stem.apply(params, v), (x,)), 4
        )
        got_b = stem_shift_matmul(x, w1, b1, w2, b2)
        out["max_abs_diff"]["B_shift_matmul"] = float(
            jnp.max(jnp.abs(got_b.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        out["variants_ms"]["B_shift_matmul"] = round(
            timed(functools.partial(stem_shift_matmul, w1=w1, b1=b1, w2=w2, b2=b2), (x,)), 4
        )

    try:
        prun = make_pallas_stem(H, W, Cin, F, k, args.blk)
        got_c = prun(x, w1, b1, w2, b2)
        out["max_abs_diff"]["C_pallas_fused"] = float(
            jnp.max(jnp.abs(got_c.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        out["variants_ms"]["C_pallas_fused"] = round(
            timed(lambda v: prun(v, w1, b1, w2, b2), (x,)), 4
        )
    except Exception as e:  # commit the failure, not silence
        out["pallas_error"] = f"{type(e).__name__}: {e}"[:500]

    print(json.dumps(out))
    if args.save:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
