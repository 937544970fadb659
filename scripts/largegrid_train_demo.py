"""REAL-hardware large-grid training demonstration (VERDICT r3 #6, second half).

checkpoints/spatial_train_memory.json established the memory *analysis*:
per-device temp memory of the GSPMD spatially-sharded train step is ~1/8 of
the single-device step at 1024^2. This script supplies the missing *execution*
evidence on the real chip: it runs the full generating train step (on-device
data synthesis + forward + backward + adam) of the bench config at grids far
beyond the reference's 384^2 training scale (1025^2, 1449x2049, 2049^2 —
4.4-28x the reference's largest training pixels) and records steps/s,
finite decreasing loss, and the chip's own peak-HBM counters.

Writes checkpoints/largegrid_train_demo.json.

Usage: python scripts/largegrid_train_demo.py [--steps 30] [--batch 4]
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
import numpy as np
import optax

from poisson_cnn_tpu.data import (
    GridSamplingConfig,
    Normalizations,
    ReverseConfig,
    generate_batch,
)
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, load_fast_config

GRIDS = ((1025, 1025), (1449, 2049), (2049, 2049))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--out", default="/root/repo/checkpoints/largegrid_train_demo.json")
    args = p.parse_args()

    dev = jax.devices()[0]
    model = HPNNFast(load_fast_config())
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 65, 65, 1), jnp.float32),
            jnp.full((1, 1), 0.01, jnp.float32),
        )
    params = jax.device_put(params, dev)
    tx = optax.adam(1e-4)
    opt_state = jax.device_put(tx.init(params), dev)

    results = {"device": str(dev.device_kind), "batch": args.batch, "grids": {}}
    for shape in GRIDS:
        cfg = ReverseConfig(
            batch_size=args.batch,
            grids=GridSamplingConfig(
                ((shape[0], shape[0]), (shape[1], shape[1])), (1e-3, 4e-3), snap=1
            ),
            fourier_mode_range=(1, 10), taylor_degree_range=(2, 6),
            bc="dirichlet",
            normalizations=Normalizations(
                rhs_max_magnitude=1.0, soln_max_magnitude=True
            ),
        )

        @jax.jit
        def step(params, opt_state, key):
            def lf(p):
                batch = generate_batch(key, cfg, shape)
                pred = model.apply(p, batch["rhs"], batch["dx"])
                return jnp.mean((pred - batch["soln"]) ** 2) + 0.2 * jnp.mean(
                    jnp.abs(pred - batch["soln"])
                )

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        name = "x".join(map(str, shape))
        print(f"[{name}] compiling ...", flush=True)
        key = jax.random.PRNGKey(7)
        t0 = time.time()
        p2, o2, l0 = step(params, opt_state, key)
        l0 = float(jax.device_get(l0))
        compile_s = time.time() - t0

        losses_seen = [l0]
        pcur, ocur = p2, o2
        t1 = time.time()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            pcur, ocur, loss = step(pcur, ocur, sub)
        losses_seen.append(float(jax.device_get(loss)))
        dt = time.time() - t1

        mem = {}
        try:
            stats = dev.memory_stats() or {}
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if k in stats:
                    mem[k + "_gib"] = round(stats[k] / 2**30, 3)
        except Exception:
            pass
        row = {
            "compile_s": round(compile_s, 1),
            "steps": args.steps,
            "steps_per_s": round(args.steps / dt, 3),
            "samples_per_s": round(args.steps * args.batch / dt, 2),
            "loss_first": round(losses_seen[0], 5),
            "loss_last": round(losses_seen[-1], 5),
            "memory": mem,
        }
        assert np.isfinite(losses_seen[-1]), f"loss diverged at {name}"
        results["grids"][name] = row
        print(f"[{name}] {row}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
