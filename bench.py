"""Headline benchmark: 256x256 Poisson solves/sec through the HPNN on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The default
run also measures BASELINE.md's second metric (train samples/sec/chip, full
generating train step) and embeds it in the line's `detail` — use --train for
that metric standalone or --forward-only to skip it.
Baseline target (BASELINE.md): >= 5,000 solves/sec at 256x256 on one TPU v5e.

Measurement is designed to be un-fakeable:
  * the timed region is a single jitted lax.scan whose iteration i+1 input
    depends on iteration i's output (a traced scalar perturbation), so no
    iteration can be elided or overlapped away;
  * the loop result is fetched with jax.device_get, which cannot return
    before every chained execution finished (block_until_ready on the remote
    axon backend proved unreliable in round 1);
  * implied FLOP/s is computed from XLA's own cost analysis of the forward
    graph and the run HARD-FAILS if it exceeds the chip's peak — a physically
    impossible number aborts instead of being reported.
"""

import argparse
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

# bf16 peak FLOP/s by TPU device kind (dense, per chip). Used only as an
# upper bound for the sanity check; unknown kinds fall back to v5e.
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _acquire_device(retries: int = 6, base_delay: float = 5.0):
    """jax.devices()[0] with bounded retry-with-backoff.

    The axon TPU backend occasionally fails to initialize with a transient
    UNAVAILABLE error (this killed the round-3 driver bench run, BENCH_r03.json
    rc=1). Each retry clears JAX's cached backend-init failure first so the
    re-attempt actually re-initializes rather than replaying the cached error.
    """
    import sys

    last_err = None
    delay = base_delay
    for attempt in range(retries):
        try:
            devs = jax.devices()
            if devs:
                return devs[0]
        except Exception as e:  # RuntimeError("Unable to initialize backend …")
            last_err = e
            print(
                f"bench: backend init attempt {attempt + 1}/{retries} failed: "
                f"{e!r}; retrying in {delay:.0f}s",
                file=sys.stderr,
            )
            try:
                import jax.extend.backend as _jeb

                _jeb.clear_backends()
            except Exception:
                pass
            time.sleep(delay)
            delay = min(delay * 2, 60.0)
    raise RuntimeError(f"backend unavailable after {retries} attempts: {last_err!r}")


def _emit_error_line(metric: str, err: BaseException) -> None:
    """On unrecoverable failure print ONE parseable JSON line (instead of a
    bare traceback) so the driver's BENCH_rN.json capture still parses."""
    print(
        json.dumps(
            {
                "metric": metric,
                "value": None,
                "unit": "solves/sec",
                "vs_baseline": None,
                "error": f"{type(err).__name__}: {err}",
            }
        )
    )


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK_BF16.items():
        if k.lower() in str(kind).lower():
            return v
    return 197e12


def _graph_flops(fn, *args) -> float:
    """FLOPs of one fn(*args) call per XLA's cost analysis (0.0 if unavailable)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        try:
            cost = lowered.compile().cost_analysis()
        except Exception:
            cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_train(args):
    """Train samples/sec/chip (BASELINE.md training metric): time N full
    generating train steps (on-device data synthesis + forward + backward +
    adam update) on the HPNN-Fast trainer config at args.n x args.n. Each
    step's params feed the next, so no step can be elided; the final
    device_get forces completion of the whole chain. Returns the metrics
    dict (so the default bench can embed it in the headline line)."""
    import optax

    from poisson_cnn_tpu import losses
    from poisson_cnn_tpu.data import (
        GridSamplingConfig,
        Normalizations,
        ReverseConfig,
        generate_batch,
    )
    from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, load_fast_config

    n, batch = args.n, args.batch
    data_cfg = ReverseConfig(
        batch_size=batch,
        grids=GridSamplingConfig(((n, n), (n, n)), (5e-3, 5e-2)),
        normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
    )
    loss_cfg = losses.LossConfig(
        mse_weight=1.0, mae_weight=0.2, integral_weight=0.0, global_batch_size=batch
    )
    model = HPNNFast(load_fast_config())
    dev = _acquire_device()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, n, n, 1), dtype=jnp.float32),
            jnp.full((1, 1), 2.0 / (n - 1), dtype=jnp.float32),
        )
    params = jax.device_put(params, dev)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt_state = jax.device_put(tx.init(params), dev)

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            b = generate_batch(key, data_cfg, (n, n))
            pred = model.apply(p, b["rhs"], b["dx"])
            return losses.loss_wrapper(loss_cfg, b["soln"], pred, b["rhs"], b["dx"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    # cost the FULL step (params/opt_state outputs kept live): a loss-only
    # wrapper lets XLA dead-code-eliminate the entire backward pass + adam
    # update, halving the reported FLOPs (and MFU) of the training metric
    flops_per_step = _graph_flops(
        train_step, params, opt_state, jax.random.PRNGKey(0)
    )

    key = jax.random.PRNGKey(1)
    # compile + warmup
    params2, opt_state2, loss = train_step(params, opt_state, key)
    jax.device_get(loss)
    best_dt = float("inf")
    for _ in range(args.repeats):
        p, o = params2, opt_state2
        t0 = time.perf_counter()
        for i in range(args.iters):
            key, sub = jax.random.split(key)
            p, o, loss = train_step(p, o, sub)
        jax.device_get((loss, jax.tree_util.tree_leaves(p)[0]))
        best_dt = min(best_dt, time.perf_counter() - t0)

    samples_per_sec = batch * args.iters / best_dt
    implied_flops = flops_per_step * args.iters / best_dt
    peak = _peak_flops(dev)
    if flops_per_step and implied_flops > peak:
        raise SystemExit(
            f"BENCH INVALID: implied {implied_flops/1e12:.1f} TFLOP/s exceeds "
            f"{dev.device_kind} peak {peak/1e12:.0f} TFLOP/s."
        )
    return {
        "metric": f"HPNN-fast {n}x{n} train samples/sec/chip (generating step)",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": None,
        "detail": {
            "batch": batch,
            "steps_timed": args.iters,
            "gflop_per_step": round(flops_per_step / 1e9, 2),
            "implied_tflops": round(implied_flops / 1e12, 2),
            "mfu_vs_bf16_peak": round(implied_flops / peak, 4),
            "device_kind": str(getattr(dev, "device_kind", "unknown")),
        },
    }


def _time_chained_forward(model, params, rhs, dx, iters, repeats, dev):
    """Shared un-elidable chained-scan forward timing (see module docstring).
    Returns (solves_per_sec, flops_per_call, implied_flops, peak)."""

    def fwd(params, rhs, dx):
        return model.apply(params, rhs, dx)

    flops_per_call = _graph_flops(fwd, params, rhs, dx)

    @jax.jit
    def chained(params, rhs, dx):
        def body(carry, _):
            r = rhs * (1.0 + 1e-12 * carry)
            out = fwd(params, r, dx)
            return jnp.mean(out.astype(jnp.float32)), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    jax.device_get(chained(params, rhs, dx))
    best_dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(params, rhs, dx))
        best_dt = min(best_dt, time.perf_counter() - t0)

    batch = rhs.shape[0]
    solves_per_sec = batch * iters / best_dt
    implied_flops = flops_per_call * iters / best_dt
    peak = _peak_flops(dev)
    if flops_per_call and implied_flops > peak:
        raise SystemExit(
            f"BENCH INVALID: implied {implied_flops/1e12:.1f} TFLOP/s exceeds "
            f"{dev.device_kind} peak {peak/1e12:.0f} TFLOP/s — the timing did "
            "not measure real execution. Refusing to report."
        )
    return solves_per_sec, flops_per_call, implied_flops, peak


_FAST3D_CONFIG = "/root/repo/checkpoints/hpnn_fast_3d_v5/config.json"


def bench_fast3d(args, dev=None):
    """3-D solves/sec + MFU at args.n3d^3 on the trained 3-D artifact config
    (VERDICT round-4 #2: the 'beats the reference's broken N-D model' claim
    needs a speed number; reference model
    /root/reference/poisson_CNN/models/Homogeneous_Poisson_NN.py is
    rank-general but broken as shipped). Batch default 16 sizes 65^3 bf16
    activations to v5e HBM."""
    from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig

    with open(_FAST3D_CONFIG) as f:
        cfg_dict = json.load(f)
    cfg_dict["scale_filters"] = tuple(cfg_dict["scale_filters"])
    cfg_dict["dx_mlp_units"] = tuple(cfg_dict["dx_mlp_units"])
    model = HPNNFast(HPNNFastConfig(**cfg_dict))

    n, batch = args.n3d, args.batch3d
    if dev is None:
        dev = _acquire_device()
    rhs = jnp.ones((batch, n, n, n, 1), dtype=jnp.float32)
    dx = jnp.full((batch, 1), 2.0 / (n - 1), dtype=jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, n, n, n, 1), dtype=jnp.float32),
            jnp.full((1, 1), 2.0 / (n - 1), dtype=jnp.float32),
        )
    params = jax.device_put(params, dev)
    iters = args.iters3d
    solves_per_sec, flops_per_call, implied_flops, peak = _time_chained_forward(
        model, params, rhs, dx, iters, args.repeats, dev
    )
    return {
        "metric": f"HPNN-fast3d {n}^3 Poisson solves/sec (single chip)",
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec",
        "vs_baseline": None,
        "detail": {
            "batch": batch,
            "chained_iters": iters,
            "gflop_per_solve": round(flops_per_call / batch / 1e9, 3),
            "implied_tflops": round(implied_flops / 1e12, 2),
            "mfu_vs_bf16_peak": round(implied_flops / peak, 4),
            "device_kind": str(getattr(dev, "device_kind", "unknown")),
            "config": _FAST3D_CONFIG,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model",
        default="fast",
        choices=["fast", "flagship", "fast3d"],
        help="fast = FLOP-reduced HPNN-Fast (accuracy parity shown in "
        "checkpoints/hpnn_fast/eval.json); flagship = reference-scale HPNN",
    )
    ap.add_argument("--batch", type=int, default=128)
    # 512, not 32: each jitted call through the tunneled backend pays a fixed
    # ~24ms host<->device round trip (measured in scripts/bench_component_
    # profile.py). At 32 iters that adds ~0.75ms/batch (-36% on the headline
    # 2.57ms batch); at 512 it adds <0.05ms. 512 iters x 2.6ms keeps a timed
    # call ~1.3s, still well inside the driver budget.
    ap.add_argument("--iters", type=int, default=512, help="chained scan length")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--n", type=int, default=256, help="grid size")
    ap.add_argument(
        "--train", action="store_true",
        help="measure ONLY train samples/sec/chip (full generating train "
        "step: on-device data synthesis + fwd + bwd + adam update; steps are "
        "inherently dependency-chained through the params)",
    )
    ap.add_argument(
        "--forward-only", action="store_true",
        help="skip the training-throughput measurement that the default run "
        "embeds in the headline line's detail",
    )
    ap.add_argument("--n3d", type=int, default=65, help="3-D grid size per axis")
    ap.add_argument("--batch3d", type=int, default=16)
    ap.add_argument("--iters3d", type=int, default=64,
                    help="3-D chained scan length (65^3 solves are ~200x a "
                    "256^2 solve, so 64 iters already amortizes dispatch)")
    ap.add_argument("--skip-3d", action="store_true",
                    help="skip the 3-D row the default run embeds in detail")
    args = ap.parse_args()
    if args.train:
        print(json.dumps(bench_train(args)))
        return
    if args.model == "fast3d":
        print(json.dumps(bench_fast3d(args)))
        return

    from poisson_cnn_tpu.models import HPNN, HPNNConfig
    from poisson_cnn_tpu.models.hpnn_fast import (
        HPNNFast,
        load_fast_config,
        loaded_fast_config_path,
    )

    n, batch = args.n, args.batch
    if args.model == "flagship":
        model = HPNN(HPNNConfig(dtype="bfloat16"))
        batch = min(batch, 8)
    else:
        model = HPNNFast(load_fast_config())

    dev = _acquire_device()
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
    params = jax.device_put(params, dev)

    iters = args.iters
    solves_per_sec, flops_per_call, implied_flops, peak = _time_chained_forward(
        model, params, rhs, dx, iters, args.repeats, dev
    )
    mfu = implied_flops / peak if flops_per_call else float("nan")

    detail = {
        "batch": batch,
        "chained_iters": iters,
        "gflop_per_solve": round(flops_per_call / batch / 1e9, 3),
        "implied_tflops": round(implied_flops / 1e12, 2),
        "mfu_vs_bf16_peak": round(mfu, 4),
        "device_kind": str(getattr(dev, "device_kind", "unknown")),
        "fast_config": loaded_fast_config_path() if args.model == "fast" else None,
    }
    # BASELINE.md's second metric (train samples/sec/chip), embedded in the
    # same single JSON line so the driver captures both measurements
    if args.model == "fast" and not args.forward_only:
        try:
            t = bench_train(args)
            detail["train_samples_per_sec_chip"] = t["value"]
            detail["train_detail"] = t["detail"]
        except Exception as e:  # keep the headline even if the train leg fails
            import sys
            import traceback

            traceback.print_exc(file=sys.stderr)
            detail["train_error"] = repr(e)
    # 3-D perf row (VERDICT round-4 #2): driver-visible in the same line
    if args.model == "fast" and not args.skip_3d:
        try:
            t3 = bench_fast3d(args, dev=dev)
            detail["fast3d_solves_per_sec"] = t3["value"]
            detail["fast3d_detail"] = t3["detail"]
        except Exception as e:  # keep the headline even if the 3-D leg fails
            import sys
            import traceback

            traceback.print_exc(file=sys.stderr)
            detail["fast3d_error"] = repr(e)

    print(
        json.dumps(
            {
                "metric": f"HPNN-{args.model} {n}x{n} Poisson solves/sec (single chip)",
                "value": round(solves_per_sec, 2),
                "unit": "solves/sec",
                "vs_baseline": round(solves_per_sec / 5000.0, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise  # BENCH INVALID guards must keep aborting loudly
    except BaseException as e:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_error_line("HPNN-fast 256x256 Poisson solves/sec (single chip)", e)
