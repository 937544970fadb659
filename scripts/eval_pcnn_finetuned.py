"""Evaluate the end-to-end fine-tuned PCNN checkpoint with Jacobi
post-smoothing (the reference PCNN's jacobi_iterations option,
`models/Poisson_CNN_Legacy.py:11,48-49`): loads the combined checkpoint
from scripts/pcnn_finetune.py and reports rel-L2 at 10/20 sweeps.

Result (committed eval_jacobi.json): 7.9% mean / 4.8% median at 20 sweeps
on the round-1 combined protocol (random RHS + 4 nonzero Dirichlet BCs) —
down from 13.7%/10.1% (round-1 components) and 10.9%/7.9% (fine-tuned,
no smoothing).
"""
import os, sys, json
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception: pass
import jax.numpy as jnp
import pcnn_finetune as ft
from poisson_cnn_tpu.models import PCNN, PCNNConfig, HPNN, DBCNN
from poisson_cnn_tpu.train.loop import restore_checkpoint
import train_hpnn_demo as hdemo
import train_dbcnn_demo as ddemo

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    hp = HPNN(hdemo.BIG_MODEL).init(jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01))
    dp = DBCNN(ddemo.MODEL).init(jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97)
like = {"params": {"HPNN_0": hp["params"], "DBCNN_0": dp["params"]}}
params, _ = restore_checkpoint("/root/repo/checkpoints/pcnn_finetuned/step_4000", like)
params = jax.device_put(params, jax.devices()[0])

out = {}
for nj in (10, 20):
    cfg = PCNNConfig(hpnn=hdemo.BIG_MODEL, dbcnn=ddemo.MODEL,
                     hpnn_scale_mode="match_peak_laplacian", jacobi_iterations=nj)
    model = PCNN(cfg)
    out[f"jacobi_{nj}"] = ft.evaluate(model, params, "series")
    print(nj, out[f"jacobi_{nj}"], flush=True)
json.dump(out, open("/root/repo/checkpoints/pcnn_finetuned/eval_jacobi.json", "w"), indent=2)
