"""Optimizers and LR scheduling.

Reference behavior: SGD/Adam wrapped in hvd.DistributedOptimizer with
per-epoch LR annealing on loss plateau (SURVEY.md §3.1 "CE trainer"). Here:
optax chains with an injected lr *scale* hyperparameter so the host-side
PlateauAnnealer can halve the LR between epochs without re-jitting.
"""

from __future__ import annotations

from typing import Optional

import optax

from pykaldi2_tpu.config import OptimizerConfig


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """Build the optax chain: clip → (sgd|momentum|adam) with scheduled LR.

    The returned transform's hyperparams include ``lr_scale`` (init 1.0);
    multiply it down via ``set_lr_scale`` for plateau annealing.
    """

    def schedule(count):
        lr = cfg.lr
        if cfg.warmup_steps > 0:
            import jax.numpy as jnp

            lr = lr * jnp.minimum(1.0, (count + 1) / cfg.warmup_steps)
        return lr

    if cfg.type == "sgd":
        base = optax.sgd(schedule, momentum=None)
    elif cfg.type == "momentum":
        base = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.type == "adam":
        base = optax.adam(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.type!r}")

    parts = []
    if cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(base)
    parts.append(optax.inject_hyperparams(_scale_by)(lr_scale=1.0))
    return optax.chain(*parts)


def _scale_by(lr_scale):
    return optax.scale(lr_scale)


def set_lr_scale(opt_state, scale: float):
    """Return opt_state with the injected lr_scale hyperparameter replaced."""
    import jax

    # the inject_hyperparams state is the last element of the chain state
    inner = opt_state[-1]
    new_hp = dict(inner.hyperparams)
    new_hp["lr_scale"] = jax.numpy.asarray(scale, dtype=jax.numpy.asarray(new_hp["lr_scale"]).dtype)
    new_inner = inner._replace(hyperparams=new_hp)
    return opt_state[:-1] + (new_inner,)


class PlateauAnnealer:
    """Halve LR when the tracked loss stops improving (reference anneal-lr)."""

    def __init__(self, factor: float = 0.5, patience: int = 1, min_scale: float = 1e-3):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, loss: float) -> float:
        """Feed the epoch loss; returns the (possibly reduced) lr scale."""
        if loss < self.best - 1e-6:
            self.best = loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale

    def state(self) -> dict:
        """JSON-serializable state for checkpoint meta (resume support)."""
        return {"best": self.best, "bad_epochs": self.bad_epochs, "scale": self.scale}

    def restore_from_checkpoint(self, resume_meta: Optional[dict], opt_state):
        """Restore plateau state from checkpoint meta and re-apply the LR
        scale — otherwise the first post-resume epoch silently resets
        lr_scale to 1.0 (ADVICE round 1). Old checkpoints without "anneal"
        still carry lr_scale. Returns the (possibly updated) opt_state.
        """
        if not resume_meta:
            return opt_state
        self.restore(resume_meta.get("anneal")
                     or {"scale": resume_meta.get("lr_scale", 1.0)})
        return set_lr_scale(opt_state, self.scale)

    def restore(self, state: Optional[dict]):
        """Restore from checkpoint meta; tolerates missing/old checkpoints."""
        if not state:
            return
        self.best = float(state.get("best", self.best))
        self.bad_epochs = int(state.get("bad_epochs", self.bad_epochs))
        self.scale = float(state.get("scale", self.scale))
