"""Fine-tune the Neumann HPNN on the NS loop's OWN pressure-Poisson
distribution (round-3 VERDICT item #1).

Data: harvested (rhs, soln) pairs from `scripts/ns_harvest_pressure_rhs.py`
(Taylor vortex + driven cavity runs, exact DCT ground truth, zero-mean Neumann
gauge). Each sample is normalized with the Neumann training convention
(rhs -> unit peak, soln -> zero-mean unit peak; the in-loop lstsq amplitude
restore makes the model scale-free, `ns2d/stepper.py` cnn_pressure_initializer)
and augmented with the dihedral symmetries of the square grid (exact for the
FD Laplacian when dx == dy — rhs and soln transform identically).

To avoid catastrophic forgetting of the general Neumann family, a fraction of
steps trains on the original synthetic reverse-Neumann data (the
hpnn_neumann recipe, `scripts/train_hpnn_demo.py --neumann`).

Eval = the experiment's own criterion: field rel-L2 of the lstsq-amplitude
prediction vs the exact zero-mean solution, on held-out runs with different
(Re, dt, lid velocity) — the quantity `ns_cnn_experiment.py` reports as
`cnn_field_rel_l2`. Target (VERDICT): <= 0.3 on in-loop RHS.

Usage: python scripts/ns_inloop_finetune.py [--steps N] [--eval-only CKPT]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

from poisson_cnn_tpu import losses
from poisson_cnn_tpu.data import generate_batch
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint
import train_hpnn_demo as hdemo

DATA_DIR = "/root/repo/checkpoints/ns_inloop_data"


def load_split(split, grids):
    out = {}
    for n in grids:
        d = np.load(os.path.join(DATA_DIR, f"{split}_g{n}.npz"))
        out[n] = {"rhs": d["rhs"], "soln": d["soln"], "dx": d["dx"]}
    return out


def normalize_pair(rhs, soln):
    """Training convention: rhs -> unit peak, soln -> zero-mean unit peak."""
    rp = np.abs(rhs).max(axis=(1, 2), keepdims=True) + 1e-30
    soln = soln - soln.mean(axis=(1, 2), keepdims=True)
    sp = np.abs(soln).max(axis=(1, 2), keepdims=True) + 1e-30
    return rhs / rp, soln / sp


def augment(rng, rhs, soln):
    """Random dihedral-group element per sample (square grid, dx == dy)."""
    k = rng.integers(0, 4, size=rhs.shape[0])
    t = rng.integers(0, 2, size=rhs.shape[0])
    ro, so = np.empty_like(rhs), np.empty_like(soln)
    for i in range(rhs.shape[0]):
        a, b = np.rot90(rhs[i], k[i]), np.rot90(soln[i], k[i])
        if t[i]:
            a, b = a.T, b.T
        ro[i], so[i] = a, b
    return ro, so


def make_eval(model, grids=(64, 100, 128), smooth_factor=4):
    """Experiment-criterion eval on held-out in-loop problems: field rel-L2 of
    the DEPLOYED initializer procedure — smoothed prediction + energy-optimal
    amplitude (`ns2d.cnn_pressure_initializer(amplitude='energy',
    smooth_factor=4)`), i.e. exactly what `ns_cnn_experiment.py` reports as
    `cnn_field_rel_l2`. The per-sample-oracle row (best possible scalar
    amplitude on the raw prediction) is the floor the amplitude estimate is
    judged against."""
    from poisson_cnn_tpu.ops import resize_align_corners

    data = load_split("eval", grids)

    @jax.jit
    def field_rel_l2(params, rhs, soln, dx):
        rp = jnp.max(jnp.abs(rhs), axis=(1, 2, 3), keepdims=True) + 1e-30
        pred = model.apply(params, rhs / rp, dx)
        m, n = pred.shape[1], pred.shape[2]
        sm = resize_align_corners(
            resize_align_corners(
                pred, (max(2, m // smooth_factor), max(2, n // smooth_factor)),
                "bilinear",
            ),
            (m, n), "bicubic",
        )
        sm = sm - jnp.mean(sm, axis=(1, 2, 3), keepdims=True)
        gpx = (sm[:, 1:, :, :] - sm[:, :-1, :, :]) / dx[:, 0, None, None, None]
        gpy = (sm[:, :, 1:, :] - sm[:, :, :-1, :]) / dx[:, 1, None, None, None]
        num = -jnp.sum(rhs * sm, axis=(1, 2, 3))
        den = (jnp.sum(gpx * gpx, axis=(1, 2, 3))
               + jnp.sum(gpy * gpy, axis=(1, 2, 3)) + 1e-30)
        est = sm * (num / den)[:, None, None, None]

        def rel(x):
            d = (x - soln).reshape(x.shape[0], -1)
            s = soln.reshape(soln.shape[0], -1)
            return jnp.linalg.norm(d, axis=1) / (jnp.linalg.norm(s, axis=1) + 1e-30)

        # per-sample oracle amplitude on the raw prediction (floor)
        p0 = pred - jnp.mean(pred, axis=(1, 2, 3), keepdims=True)
        s_or = (jnp.sum(p0 * soln, axis=(1, 2, 3))
                / (jnp.sum(p0 * p0, axis=(1, 2, 3)) + 1e-30))
        return rel(est), rel(p0 * s_or[:, None, None, None])

    def run(params):
        errs, floors = [], []
        for n, d in data.items():
            rhs = jnp.asarray(d["rhs"][..., None])
            soln = d["soln"] - d["soln"].mean(axis=(1, 2), keepdims=True)
            soln = jnp.asarray(soln[..., None])
            dx = jnp.broadcast_to(jnp.asarray(d["dx"])[None], (rhs.shape[0], 2))
            e, f = field_rel_l2(params, rhs, soln, dx)
            errs.append(np.asarray(e))
            floors.append(np.asarray(f))
        e, f = np.concatenate(errs), np.concatenate(floors)
        return {
            "energy_field_rel_l2_mean": float(e.mean()),
            "energy_field_rel_l2_median": float(np.median(e)),
            "energy_field_rel_l2_p90": float(np.percentile(e, 90)),
            "oracle_floor_rel_l2_mean": float(f.mean()),
            "n": int(e.size),
        }

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--mix-reverse", type=float, default=0.3)
    p.add_argument("--from", dest="from_ckpt",
                   default="/root/repo/checkpoints/hpnn_neumann/step_12000")
    p.add_argument("--eval-only", default=None)
    p.add_argument("--grids", type=int, nargs="+", default=[64, 100, 128])
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_neumann_inloop")
    args = p.parse_args()

    model_cfg = dataclasses.replace(hdemo.BIG_MODEL, bc_type="neumann")
    model = HPNN(model_cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)),
            jnp.full((1, 1), 0.01),
        )
    evaluate = make_eval(model, tuple(args.grids))

    if args.eval_only:
        params, _ = restore_checkpoint(os.path.abspath(args.eval_only), params)
        params = jax.device_put(params, jax.devices()[0])
        print(json.dumps(evaluate(params)))
        return

    params, _ = restore_checkpoint(os.path.abspath(args.from_ckpt), params)
    params = jax.device_put(params, jax.devices()[0])

    train = load_split("train", args.grids)
    rng = np.random.default_rng(0)

    rev_cfg = dataclasses.replace(hdemo.DATA, bc="neumann", include_taylor=False)
    loss_cfg = losses.LossConfig(
        mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
        global_batch_size=args.batch,
    )
    rev_loss_cfg = dataclasses.replace(
        loss_cfg, global_batch_size=rev_cfg.batch_size
    )

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 100, args.steps, args.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    @jax.jit
    def step_harvested(params, opt_state, rhs, soln, dx):
        def loss_fn(p):
            pred = model.apply(p, rhs, dx)
            return losses.loss_wrapper(loss_cfg, soln, pred, rhs, dx)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    rev_cache = {}

    def make_rev_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_batch(key, rev_cfg, shape)
                pred = model.apply(p, batch["rhs"], batch["dx"])
                return losses.loss_wrapper(
                    rev_loss_cfg, batch["soln"], pred, batch["rhs"], batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    rev_shapes = [(65, 65), (97, 97), (129, 97), (97, 129)]
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    running = []
    best = [float("inf"), None]
    os.makedirs(args.out, exist_ok=True)
    for it in range(args.steps):
        if args.mix_reverse > 0 and rng.random() < args.mix_reverse:
            shape = rev_shapes[rng.integers(len(rev_shapes))]
            if shape not in rev_cache:
                print(f"[{it}] compiling reverse shape {shape}", flush=True)
                rev_cache[shape] = make_rev_step(shape)
            key, sub = jax.random.split(key)
            params, opt_state, loss = rev_cache[shape](params, opt_state, sub)
        else:
            n = args.grids[rng.integers(len(args.grids))]
            pool = train[n]
            idx = rng.integers(pool["rhs"].shape[0], size=args.batch)
            rhs, soln = augment(rng, pool["rhs"][idx], pool["soln"][idx])
            rhs, soln = normalize_pair(rhs, soln)
            dx = np.broadcast_to(pool["dx"][None], (args.batch, 2)).copy()
            params, opt_state, loss = step_harvested(
                params, opt_state, jnp.asarray(rhs[..., None]),
                jnp.asarray(soln[..., None]), jnp.asarray(dx),
            )
        running.append(float(loss))
        if (it + 1) % 200 == 0:
            window = float(np.mean(running[-200:]))
            print(f"step {it+1}: loss={window:.5f} "
                  f"({(it+1)/(time.time()-t0):.2f} steps/s)", flush=True)
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")
            if window < best[0]:
                best[0] = window
                best[1] = jax.device_get(params)
                save_checkpoint(args.out, best[1], it + 1)

    if best[1] is not None and best[0] < float(np.mean(running[-200:])):
        params = jax.device_put(best[1], jax.devices()[0])
        print(f"using best-window params (loss {best[0]:.5f})", flush=True)
    path = save_checkpoint(args.out, params, args.steps)
    metrics = evaluate(params)
    metrics["final_train_loss"] = float(np.mean(running[-200:]))
    metrics["checkpoint"] = path
    metrics["steps"] = args.steps
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
