"""Honest Pallas-vs-XLA Jacobi smoother benchmark (un-fakeable methodology).

Round-1's "~17x" claim was measured with block_until_ready on the remote axon
backend, which proved unreliable (see bench.py). This re-measures both
implementations with the dependency-chained lax.scan + device_get recipe:
iteration i+1's input depends on iteration i's output, the result is fetched
with device_get, and implied HBM bandwidth is printed as a physical sanity
bound (the op is bandwidth-bound: XLA traffic ~2*sweeps*|u|, Pallas ~2*|u|).

Usage: python scripts/bench_pallas_smoother.py [--n 256] [--batch 16] [--sweeps 10]
Prints one JSON line with both timings and the speedup.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def timed_chain(fn, u, rhs, dx, iters, repeats):
    @jax.jit
    def chained(u, rhs, dx):
        def body(carry, _):
            out = fn(u * (1.0 + 1e-12 * carry), rhs, dx)
            return jnp.mean(out), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    jax.device_get(chained(u, rhs, dx))  # compile + warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(u, rhs, dx))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sweeps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from poisson_cnn_tpu.ops.pallas_kernels import jacobi_smooth_pallas
    from poisson_cnn_tpu.solvers import jacobi_smooth

    key = jax.random.PRNGKey(0)
    u = jnp.zeros((args.batch, args.n, args.n, 1), jnp.float32)
    rhs = jax.random.normal(key, u.shape, jnp.float32)
    dx = jnp.full((args.batch, 2), 0.01, jnp.float32)

    def xla_fn(u, rhs, dx):
        return jacobi_smooth(u, rhs, dx, args.sweeps)

    def pallas_fn(u, rhs, dx):
        return jacobi_smooth_pallas(u, rhs, dx, n_iterations=args.sweeps)

    # correctness cross-check before timing
    err = float(jnp.abs(xla_fn(u, rhs, dx) - pallas_fn(u, rhs, dx)).max())
    assert err < 1e-4, err

    t_xla = timed_chain(xla_fn, u, rhs, dx, args.iters, args.repeats)
    t_pal = timed_chain(pallas_fn, u, rhs, dx, args.iters, args.repeats)

    bytes_field = args.batch * args.n * args.n * 4
    print(
        json.dumps(
            {
                "metric": f"jacobi smoother {args.sweeps} sweeps @{args.n}^2 x{args.batch}",
                "xla_ms": round(t_xla * 1e3, 3),
                "pallas_ms": round(t_pal * 1e3, 3),
                "speedup": round(t_xla / t_pal, 2),
                "implied_gbps_xla": round(
                    2 * args.sweeps * bytes_field / t_xla / 1e9, 1
                ),
                "implied_gbps_pallas": round(2 * bytes_field / t_pal / 1e9, 1),
                "max_abs_diff": err,
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
