"""Headline benchmark: 256x256 Poisson solves/sec through the flagship HPNN
(reference-scale config, single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 5,000 solves/sec on a single TPU v5e chip.
Measured (2026-08-16, v5e single chip, batch 8): fp32 ~43,000 solves/sec,
bf16 compute ~47,000 solves/sec (the production precision; BASELINE.md
specifies bf16).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the full-model TPU compile is ~6 min cold
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def main():
    from poisson_cnn_tpu.models import HPNN, HPNNConfig

    n, batch = 256, 8
    model = HPNN(HPNNConfig(dtype="bfloat16"))
    rhs = jnp.ones((batch, n, n, 1), dtype=jnp.float32)
    dx = jnp.full((batch, 1), 2.0 / (n - 1), dtype=jnp.float32)
    # init on CPU (avoids a second multi-minute TPU compile of the init graph)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, n, n, 1), dtype=jnp.float32),
            jnp.full((1, 1), 2.0 / (n - 1), dtype=jnp.float32),
        )
    params = jax.device_put(params, jax.devices()[0])

    @jax.jit
    def fwd(params, rhs, dx):
        return model.apply(params, rhs, dx)

    fwd(params, rhs, dx).block_until_ready()  # compile
    fwd(params, rhs, dx).block_until_ready()  # warmup
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, rhs, dx)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    value = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "HPNN 256x256 Poisson solves/sec (single chip)",
                "value": round(value, 2),
                "unit": "solves/sec",
                "vs_baseline": round(value / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
