"""Memory-scaling artifact for spatially-sharded TRAINING (VERDICT r3 #6).

Lowers the full HPNNFast training step (forward + backward + adam update) at a
grid beyond single-chip HBM comfort (default 1024^2, batch 4) twice:
  1. single-device jit (the baseline a user without sharding gets),
  2. GSPMD spatially-sharded along H over an 8-device mesh
     (`parallel.make_spatial_train_step`),
and records XLA's per-device memory analysis for both. The point of the
artifact: peak per-device memory of the sharded step ~= 1/n_dev of the
single-device step, i.e. training grids that cannot fit one chip becomes a
mesh-width knob. Writes checkpoints/spatial_train_memory.json.

Runs on the virtual CPU mesh (compile-only; nothing is executed at this size).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:
    pass

import jax.numpy as jnp
import optax

from poisson_cnn_tpu import losses
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, load_fast_config
from poisson_cnn_tpu.parallel import create_mesh
from jax.sharding import NamedSharding, PartitionSpec as P


def mem_stats(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    out = {}
    for k in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    if "temp_size_in_bytes" in out:
        out["peak_gib"] = round(
            (out["temp_size_in_bytes"] + out.get("argument_size_in_bytes", 0)) / 2**30, 3
        )
    return out


def main():
    # H must be divisible by the mesh width for an even GSPMD split; 1024 is
    # the sharded-training lattice point nearest the 1025^2 odd solver grids
    n, batch = 1024, 4
    mesh = create_mesh(8)
    model = HPNNFast(load_fast_config())

    rhs = jax.ShapeDtypeStruct((batch, n, n, 1), jnp.float32)
    soln = jax.ShapeDtypeStruct((batch, n, n, 1), jnp.float32)
    dx = jax.ShapeDtypeStruct((batch, 1), jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 65, 65, 1), jnp.float32),
            jnp.full((1, 1), 0.01, jnp.float32),
        )
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    loss_cfg = losses.LossConfig(mse_weight=1.0, mae_weight=0.2, global_batch_size=batch)

    def apply_fn(p, r, d):
        return model.apply(p, r, d)

    def step(params, opt_state, rhs, soln, dx):
        def lf(p):
            return losses.loss_wrapper(loss_cfg, soln, apply_fn(p, rhs, dx), rhs, dx)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    p_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    o_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), opt_state
    )

    print(f"lowering single-device train step at {n}^2 batch {batch} ...", flush=True)
    single = jax.jit(step).lower(p_shapes, o_shapes, rhs, soln, dx).compile()
    single_mem = mem_stats(single)
    print("single-device:", single_mem, flush=True)

    spec = NamedSharding(mesh, P(None, "data", None, None))
    repl = NamedSharding(mesh, P())
    print("lowering 8-way spatially-sharded train step ...", flush=True)
    sharded = (
        jax.jit(
            step,
            in_shardings=(repl, repl, spec, spec, repl),
            out_shardings=(repl, repl, repl),
        )
        .lower(p_shapes, o_shapes, rhs, soln, dx)
        .compile()
    )
    sharded_mem = mem_stats(sharded)
    print("8-way sharded (per device):", sharded_mem, flush=True)

    result = {
        "grid": [n, n],
        "batch": batch,
        "model_config": "checkpoints/hpnn_fast/config.json (bench config)",
        "mesh_devices": 8,
        "single_device": single_mem,
        "sharded_per_device": sharded_mem,
    }
    if single_mem and sharded_mem and "temp_size_in_bytes" in single_mem:
        result["temp_memory_ratio"] = round(
            sharded_mem["temp_size_in_bytes"] / max(single_mem["temp_size_in_bytes"], 1),
            4,
        )
    out_path = "/root/repo/checkpoints/spatial_train_memory.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
