"""Short training runs for Pix2Pix and the Poisson GAN (round-4 VERDICT #9).

The reference ships NEITHER a train script nor a config for these two
(`poisson_CNN/models/pix2pix.py:43-106` is adapted from the TF tutorial,
`models/legacy/Poisson_GAN.py:10-106` is a legacy experiment), so these runs
are brief learning demonstrations, not tuned artifacts: the bar is a loss
curve that demonstrably learns and an eval.json row in PARITY.md next to the
other zoo baselines.

Two runs:
  * pix2pix  — supervised rhs->solution regression at a fixed 64^2 grid (the
    strided encoder halves the grid 4x, so the demo uses an exact multiple of
    16). Unit-peak convention like the rest of the zoo.
  * gan      — the same generator trained adversarially via
    models/gan.py:make_gan_train_step (supervised MSE + 1e-2 non-saturating
    adversarial term, patch discriminator over [pred, rhs]).

Writes checkpoints/zoo/{pix2pix,gan}/eval.json.

Usage: python scripts/train_pix2pix_gan_demo.py [--steps N] [--models a,b]
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
from poisson_cnn_tpu.models.gan import (
    DiscriminatorConfig,
    PoissonDiscriminator,
    make_gan_train_step,
)
from poisson_cnn_tpu.models.pix2pix import Pix2PixConfig, Pix2PixGenerator

GRID = (64, 64)
BATCH = 32

DATA = ReverseConfig(
    batch_size=BATCH,
    grids=GridSamplingConfig((GRID, GRID), (5e-3, 5e-2)),
    normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
)


def eval_rel_l2(apply_fn, n_batches=8, seed=90_000):
    vals = []
    for i in range(n_batches):
        b = generate_batch(jax.random.PRNGKey(seed + i), DATA, GRID)
        pred = apply_fn(b["rhs"], b["dx"])
        err = jnp.sqrt(jnp.sum((pred - b["soln"]) ** 2, axis=(1, 2, 3)))
        den = jnp.sqrt(jnp.sum(b["soln"] ** 2, axis=(1, 2, 3)))
        vals.append(np.asarray(err / jnp.maximum(den, 1e-30)))
    v = np.concatenate(vals)
    return {
        "rel_l2_mean": float(v.mean()),
        "rel_l2_median": float(np.median(v)),
        "rel_l2_p90": float(np.percentile(v, 90)),
        "n": int(v.size),
    }


def train_pix2pix(steps, lr, out):
    model = Pix2PixGenerator(Pix2PixConfig())
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((1, *GRID, 1), jnp.float32)
    params = model.init(key, x0)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, k):
        b = generate_batch(k, DATA, GRID)

        def loss_fn(p):
            pred = model.apply(p, b["rhs"])
            return jnp.mean((pred - b["soln"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    t0, running = time.time(), []
    for it in range(steps):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        running.append(float(loss))
        if (it + 1) % 250 == 0:
            print(
                f"pix2pix step {it+1}: loss={np.mean(running[-250:]):.5f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
    metrics = eval_rel_l2(lambda rhs, dx: model.apply(params, rhs))
    metrics.update(
        first100_loss=float(np.mean(running[:100])),
        last100_loss=float(np.mean(running[-100:])),
        steps=steps,
        grid=list(GRID),
    )
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print("pix2pix", json.dumps(metrics))


def train_gan(steps, lr, out):
    gen = Pix2PixGenerator(Pix2PixConfig())
    disc = PoissonDiscriminator(DiscriminatorConfig())
    key = jax.random.PRNGKey(1)
    x0 = jnp.ones((1, *GRID, 1), jnp.float32)
    gen_params = gen.init(key, x0)
    disc_params = disc.init(key, x0, x0)
    gen_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    disc_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    gen_opt, disc_opt = gen_tx.init(gen_params), disc_tx.init(disc_params)

    step = make_gan_train_step(
        lambda p, rhs, dx: gen.apply(p, rhs), disc, gen_tx, disc_tx
    )
    t0 = time.time()
    gl_hist, dl_hist = [], []
    for it in range(steps):
        key, sub = jax.random.split(key)
        b = generate_batch(sub, DATA, GRID)
        gen_params, gen_opt, disc_params, disc_opt, m = step(
            gen_params, gen_opt, disc_params, disc_opt, b
        )
        gl_hist.append(float(m["gen_loss"]))
        dl_hist.append(float(m["disc_loss"]))
        if (it + 1) % 250 == 0:
            print(
                f"gan step {it+1}: gen={np.mean(gl_hist[-250:]):.5f} "
                f"disc={np.mean(dl_hist[-250:]):.5f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
    metrics = eval_rel_l2(lambda rhs, dx: gen.apply(gen_params, rhs))
    metrics.update(
        first100_gen_loss=float(np.mean(gl_hist[:100])),
        last100_gen_loss=float(np.mean(gl_hist[-100:])),
        last100_disc_loss=float(np.mean(dl_hist[-100:])),
        steps=steps,
        grid=list(GRID),
    )
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print("gan", json.dumps(metrics))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--models", default="pix2pix,gan")
    args = p.parse_args()
    wanted = args.models.split(",")
    if "pix2pix" in wanted:
        print("=== training pix2pix ===", flush=True)
        train_pix2pix(args.steps, args.lr, "/root/repo/checkpoints/zoo/pix2pix")
    if "gan" in wanted:
        print("=== training gan ===", flush=True)
        train_gan(args.steps, args.lr, "/root/repo/checkpoints/zoo/gan")


if __name__ == "__main__":
    main()
