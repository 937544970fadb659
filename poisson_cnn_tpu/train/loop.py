"""Generic training loop: per-shape compiled steps, LR-on-plateau, NaN guard,
orbax checkpointing.

Replaces the reference's keras `fit` + callbacks stack
(`train/hpnn_legacy_train.py:46-50`: ModelCheckpoint(save_best_only) /
ReduceLROnPlateau(patience=4) / TerminateOnNaN) with an explicit loop:
- per-batch grid shapes are sampled host-side and each distinct (bucketed)
  shape gets its own compiled train step (XLA executable cache);
- the learning rate lives in the optimizer state via optax.inject_hyperparams
  so plateau reductions don't recompile;
- checkpoints are orbax PyTree saves of {params, step} (dtype-flexible restore:
  parameters are cast onto the target dtype on load, covering the reference's
  cross-dtype checkpoint workaround in `train/utils.py:16-27`).
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..parallel import TrainState, replicate_sharding
from .config import TrainingConfig


def make_optimizer(cfg: TrainingConfig, phase: str = "main") -> optax.GradientTransformation:
    """phase='main' builds cfg.optimizer; phase='sgd-tail' builds the
    momentum-SGD tail of the two-phase 'adam-sgd' recipe (the drift study's
    fix: Adam's unit-scale updates random-walk weight norms along the output
    normalization's zero-gradient scale directions — adamw at any weight
    decay still walks — while SGD's gradient-proportional updates hold the
    basin Adam found with an exactly flat param norm)."""
    if phase == "sgd-tail":
        base = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.learning_rate * cfg.sgd_tail_lr_mult, momentum=0.9
        )
    elif cfg.optimizer in ("adam", "adam-sgd"):
        base = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate)
    elif cfg.optimizer == "adamw":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay
        )
    elif cfg.optimizer == "sgd":
        base = optax.inject_hyperparams(optax.sgd)(learning_rate=cfg.learning_rate)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), base)
    return base


def two_phase_adam_sgd(
    lr: float, switch_step: int, total_steps: int, tail_lr_mult: float = 10.0
) -> optax.GradientTransformation:
    """Single-executable two-phase optimizer: Adam (warmup cosine to 0.3x)
    before `switch_step`, momentum-SGD tail (cosine from tail_lr_mult*lr to
    5%) after, selected by a traced step counter under lax.cond.

    This is the drift study's fix in fused form: one compiled step per grid
    shape covers both phases (swapping optimizers changes the HLO and forces
    a recompile per shape — ~20 min each for flagship-size graphs on the
    remote AOT helper). The Trainer's optimizer='adam-sgd' swap-based path
    is simpler and fine for models that compile quickly; use this for huge
    compile units. Caveat: the SGD tail diverges on stiff objectives (e.g.
    fine-grid FD-Laplacian physics losses) — see the drift-study notes.
    """
    warmup = min(200, max(1, switch_step // 5))
    adam = optax.adam(
        optax.warmup_cosine_decay_schedule(0.0, lr, warmup, switch_step, lr * 0.3)
    )
    sgd = optax.sgd(
        optax.cosine_decay_schedule(
            lr * tail_lr_mult, max(1, total_steps - switch_step), alpha=0.05
        ),
        momentum=0.9,
    )

    def init(params):
        return {
            "t": jnp.zeros((), jnp.int32),
            "adam": adam.init(params),
            "sgd": sgd.init(params),  # zeros until the tail's first step
        }

    def update(grads, state, params=None):
        def do_adam(_):
            up, s = adam.update(grads, state["adam"], params)
            return up, {"t": state["t"] + 1, "adam": s, "sgd": state["sgd"]}

        def do_sgd(_):
            up, s = sgd.update(grads, state["sgd"], params)
            return up, {"t": state["t"] + 1, "adam": state["adam"], "sgd": s}

        return jax.lax.cond(state["t"] < switch_step, do_adam, do_sgd, None)

    return optax.GradientTransformation(init, update)


def save_checkpoint(ckpt_dir: str, params, step: int):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"params": jax.device_get(params), "step": step}, force=True)
    return path


def restore_checkpoint(path: str, like_params=None):
    """Restore {params, step} saved by `save_checkpoint`, casting params onto
    `like_params`' dtypes when given.

    Checkpoint-format note (round 3): HPNN branch parameter names are
    POSITIONAL over the configured branch list (`models/hpnn.py`), not
    contiguous over the branches live at init. A checkpoint written before
    round 3 whose params were initialized at a grid small enough to skip a
    branch will fail to restore with a tree-structure mismatch — re-export it
    by loading with the old naming and saving again. All in-repo artifacts
    were initialized with every branch live and are unaffected."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    params = restored["params"]
    if like_params is not None:
        # dtype-flexible restore: cast onto the target tree's dtypes
        params = jax.tree_util.tree_map(
            lambda tgt, src: jnp.asarray(src, dtype=tgt.dtype), like_params, params
        )
    return params, restored.get("step", 0)


class Trainer:
    """Drives (sample shape) -> (jitted step for that shape) -> update.

    Arguments:
    - sample_shape: () -> static grid shape for the next batch
    - make_step: (grid_shape, tx) -> jitted (state, key) -> (state, metrics)
    - train_cfg: TrainingConfig
    """

    def __init__(
        self,
        params,
        sample_shape: Callable[[], tuple],
        make_step: Callable,
        train_cfg: TrainingConfig,
        checkpoint_dir: Optional[str] = None,
        mesh=None,
        log_every: int = 50,
        metrics_path: Optional[str] = None,
    ):
        self.cfg = train_cfg
        self.tx = make_optimizer(train_cfg)
        self.sample_shape = sample_shape
        self.make_step = make_step
        self.checkpoint_dir = checkpoint_dir
        self.mesh = mesh
        self.log_every = log_every
        self._steps = {}
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )
        if mesh is not None:
            state = jax.device_put(state, replicate_sharding(mesh))
        self.state = state
        self.key = jax.random.PRNGKey(train_cfg.seed)
        self.best_loss = float("inf")
        self.history = []
        from ..utils import MetricsLogger

        self.metrics = MetricsLogger(metrics_path)

    def _step_for(self, shape):
        if shape not in self._steps:
            self._steps[shape] = self.make_step(shape, self.tx)
        return self._steps[shape]

    def set_learning_rate(self, lr: float):
        self.state = self.state.replace(
            opt_state=_set_lr(self.state.opt_state, lr)
        )

    def current_learning_rate(self) -> float:
        return float(_get_lr(self.state.opt_state))

    def _switch_to_sgd_tail(self):
        """Swap the optimizer to the momentum-SGD tail, keeping params and the
        replication sharding; compiled steps capture tx so the cache resets."""
        self.tx = make_optimizer(self.cfg, phase="sgd-tail")
        self._steps = {}
        self.state = self.state.replace(opt_state=self.tx.init(self.state.params))
        if self.mesh is not None:
            self.state = jax.device_put(self.state, replicate_sharding(self.mesh))

    def run(self):
        cfg = self.cfg
        plateau = 0
        switch_epoch = (
            max(1, int(cfg.n_epochs * cfg.sgd_tail_at))
            if cfg.optimizer == "adam-sgd" and cfg.n_epochs > 1
            else None
        )
        for epoch in range(cfg.n_epochs):
            if switch_epoch is not None and epoch == switch_epoch:
                print(f"epoch {epoch}: switching to momentum-SGD tail", flush=True)
                self._switch_to_sgd_tail()
            t0 = time.time()
            epoch_losses = []
            for it in range(cfg.steps_per_epoch):
                shape = self.sample_shape()
                step = self._step_for(shape)
                self.key, sub = jax.random.split(self.key)
                self.state, metrics = step(self.state, sub)
                # keep the loss on device: fetching it here would block host
                # dispatch against device execution every step. The NaN guard
                # only samples the LATEST loss every log_every steps — a NaN
                # anywhere in the window propagates through params into every
                # later loss, so the windowed check still catches it (within
                # log_every steps, like the reference's per-step TerminateOnNaN
                # `train/hpnn_legacy_train.py:49` but without the sync).
                epoch_losses.append(metrics["loss"])
                if (it + 1) % self.log_every == 0 or it + 1 == cfg.steps_per_epoch:
                    latest = float(epoch_losses[-1])
                    if not math.isfinite(latest):
                        # a NaN propagates through params, so the divergence
                        # originated at or up to log_every steps BEFORE this one
                        # and this loss value is the propagated one.
                        raise FloatingPointError(
                            f"non-finite loss detected at/before epoch {epoch} "
                            f"step {it} (latest sampled loss: {latest}; "
                            f"divergence originated within the last "
                            f"{self.log_every} steps)"
                        )
            # one host transfer for the whole epoch instead of one per step
            # (non-array losses — e.g. test spies — fall back to per-item float)
            if epoch_losses and isinstance(epoch_losses[0], jax.Array):
                mean_loss = float(jnp.stack(epoch_losses).mean())
            else:
                mean_loss = float(np.mean([float(x) for x in epoch_losses]))
            self.history.append(mean_loss)
            dt = time.time() - t0
            sps = cfg.steps_per_epoch / dt
            print(
                f"epoch {epoch}: loss={mean_loss:.6f} lr={self.current_learning_rate():.2e} "
                f"({sps:.2f} steps/s, {len(self._steps)} compiled shapes)",
                flush=True,
            )
            self.metrics.log(
                epoch=epoch, loss=mean_loss,
                lr=self.current_learning_rate(), steps_per_sec=sps,
                compiled_shapes=len(self._steps),
            )
            if mean_loss < self.best_loss:
                self.best_loss = mean_loss
                plateau = 0
                if self.checkpoint_dir:
                    save_checkpoint(
                        self.checkpoint_dir, self.state.params, int(self.state.step)
                    )
            else:
                plateau += 1
                if plateau > cfg.reduce_lr_patience:
                    new_lr = max(
                        self.current_learning_rate() * cfg.reduce_lr_factor,
                        cfg.min_learning_rate,
                    )
                    self.set_learning_rate(new_lr)
                    plateau = 0
        return self.state


def _find_hyperparams(opt_state):
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = _find_hyperparams(s)
            if found is not None:
                return found
    return None


def _get_lr(opt_state):
    hp = _find_hyperparams(opt_state)
    return hp.hyperparams["learning_rate"]


def _set_lr(opt_state, lr: float):
    """Return a NEW opt_state with the injected learning rate replaced.

    Purely functional: rebuilds the containing (named)tuples instead of
    assigning into `InjectHyperparamsState.hyperparams` — in-place mutation
    relies on the dict being shared by reference, which silently becomes a
    no-op on jit-donated or tree_map-reconstructed states."""

    def rebuild(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
            )
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple):
            rebuilt = [rebuild(x) for x in s]
            return type(s)(*rebuilt) if hasattr(s, "_fields") else tuple(rebuilt)
        if isinstance(s, list):
            return [rebuild(x) for x in s]
        if isinstance(s, dict):
            # e.g. optax.multi_transform keeps inner states in a dict
            return {k: rebuild(v) for k, v in s.items()}
        return s

    new_state = rebuild(opt_state)
    if _find_hyperparams(new_state) is None:
        raise ValueError("opt_state contains no inject_hyperparams learning_rate")
    return new_state
