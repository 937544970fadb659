"""Per-shape / per-distribution error breakdown for the 3-D HPNN-Fast artifacts.

The 3-D accuracy story is stuck >9% while the same recipe reaches 3-4% in 2-D
(PARITY.md artifact table). Before burning more TPU-hours, localize where the
error lives: by grid shape (isotropy), by mode count (frequency content), and
by dx spread (FiLM conditioning). Runs fine on CPU.

Usage: JAX_PLATFORMS=cpu python scripts/diagnose_3d.py CKPT_DIR [CKPT_DIR...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# force CPU: the container's sitecustomize registers the remote-TPU backend in
# every python process regardless of JAX_PLATFORMS (same workaround as
# tests/conftest.py) — this diagnostic must not contend with TPU training jobs
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:
    pass
assert jax.devices()[0].platform == "cpu"

import jax.numpy as jnp
import numpy as np

from poisson_cnn_tpu.data.reverse_nd import ReverseNDConfig, generate_batch_nd
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig
from poisson_cnn_tpu.train.loop import restore_checkpoint

SHAPES = (
    (33, 33, 33), (49, 33, 33), (49, 49, 49), (65, 49, 49),
    (65, 65, 65), (65, 65, 33), (33, 33, 65),
)


CONVENTION = "old"  # old: pair scaled by soln peak (v2/v3); new: unit-peak input


def _unit_peak_pair(batch):
    if CONVENTION == "new":  # post-fix convention (train_hpnn_fast_3d.py)
        soln = batch["soln"]
        nd = soln.ndim - 2
        speak = jnp.max(jnp.abs(soln).reshape(soln.shape[0], -1), axis=1)
        soln = soln / (speak.reshape((-1,) + (1,) * (nd + 1)) + 1e-30)
        return batch["rhs"], soln, batch["dx"]
    nd = batch["soln"].ndim - 2
    speak = jnp.max(
        jnp.abs(batch["soln"]).reshape(batch["soln"].shape[0], -1), axis=1
    ).reshape((-1,) + (1,) * (nd + 1)) + 1e-30
    return batch["rhs"] / speak, batch["soln"] / speak, batch["dx"]


def run(ckpt_dir):
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        d = json.load(f)
    for k in ("scale_filters", "dx_mlp_units"):
        if k in d:
            d[k] = tuple(d[k])
    model = HPNNFast(HPNNFastConfig(**d))
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 33, 33, 33, 1)), jnp.full((1, 3), 0.01)
    )
    steps = sorted(
        int(p.split("_")[1]) for p in os.listdir(ckpt_dir) if p.startswith("step_")
    )
    params, _ = restore_checkpoint(os.path.join(ckpt_dir, f"step_{steps[-1]}"), params)
    apply_fn = jax.jit(model.apply)

    out = {"ckpt": ckpt_dir, "step": steps[-1], "by_shape": {}, "by_modes": {}}
    # per-shape (fixed mode range 1-5, the training range)
    for si, shape in enumerate(SHAPES):
        cfg = ReverseNDConfig(batch_size=8, fourier_mode_range=(1, 5))
        errs = []
        for i in range(3):
            batch = generate_batch_nd(jax.random.PRNGKey(90_000 + 97 * si + i), cfg, shape)
            rhs, soln, dx = _unit_peak_pair(batch)
            pred = apply_fn(params, rhs, dx)
            d_ = (pred - soln).reshape(pred.shape[0], -1)
            s_ = soln.reshape(pred.shape[0], -1)
            errs.append(np.asarray(jnp.linalg.norm(d_, axis=1) / jnp.linalg.norm(s_, axis=1)))
        e = np.concatenate(errs)
        out["by_shape"]["x".join(map(str, shape))] = round(float(e.mean()), 4)
    # per-mode-count at fixed 49^3 (mode_range (m, m) forces exactly m modes/axis)
    for m in (1, 2, 3, 4, 5):
        cfg = ReverseNDConfig(batch_size=8, fourier_mode_range=(m, m))
        errs = []
        for i in range(3):
            batch = generate_batch_nd(jax.random.PRNGKey(91_000 + 31 * m + i), cfg, (49, 49, 49))
            rhs, soln, dx = _unit_peak_pair(batch)
            pred = apply_fn(params, rhs, dx)
            d_ = (pred - soln).reshape(pred.shape[0], -1)
            s_ = soln.reshape(pred.shape[0], -1)
            errs.append(np.asarray(jnp.linalg.norm(d_, axis=1) / jnp.linalg.norm(s_, axis=1)))
        e = np.concatenate(errs)
        out["by_modes"][m] = round(float(e.mean()), 4)
    print(json.dumps(out, indent=2), flush=True)
    return out


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--new-convention":
        CONVENTION = "new"
        argv = argv[1:]
    for ckpt in argv:
        run(ckpt)
