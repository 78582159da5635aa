"""Optimizer and learning-rate schedules.

AdamW through optax with injected hyperparameters so host-side schedules
(including the plateau controller, which depends on validation loss) can set
the learning rate per epoch — matching the reference's per-epoch stepping
(reference: ClassifierExperiment.py:74-82,126; scheduler/warmup_cosine.py:8-61).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def create_optimizer(learning_rate: float, weight_decay: float, freeze_mask=None):
    """AdamW with runtime-settable lr.  ``freeze_mask``: pytree of bools,
    True = trainable (used for the ResNet layer4-only fine-tune)."""
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
    if freeze_mask is not None:
        import jax

        # optax.masked leaves unmasked updates UNTOUCHED (raw gradients), so
        # the frozen complement must be explicitly zeroed
        inverse = jax.tree_util.tree_map(lambda m: not m, freeze_mask)
        tx = optax.chain(
            optax.masked(tx, freeze_mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
    return tx


def resnet_finetune_mask(params):
    """True = trainable.  Freezes every image-encoder weight except the
    `layer4` stage (reference: mmgclip/networks/encoder.py:77-88)."""
    import jax

    def keep(path, _leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys and keys[0] == "image_encoder":
            return any(k.startswith("layer4") for k in keys)
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def set_learning_rate(opt_state, lr: float):
    """Overwrite the injected learning rate inside the optimizer state."""
    import jax.numpy as jnp

    def walk(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        if isinstance(state, tuple):
            for item in state:
                walk(item)
        if hasattr(state, "inner_state"):
            walk(state.inner_state)

    walk(opt_state)
    return opt_state


class LinearWarmupCosineAnnealing:
    """Per-epoch multiplier: linear warmup, then cos^2 decay
    (reference: scheduler/warmup_cosine.py:41-61).  Float warmup_steps is a
    fraction of total (ceil), exactly as the reference."""

    def __init__(self, base_lr: float, total_steps: int, warmup_steps):
        assert warmup_steps < total_steps, "Warmup steps should be less than total steps."
        self.base_lr = base_lr
        self.tsteps = total_steps
        self.wsteps = math.ceil(total_steps * warmup_steps) if isinstance(warmup_steps, float) else warmup_steps

    def multiplier(self, step: int) -> float:
        if step < self.wsteps:
            return step / float(max(1, self.wsteps))
        cos_factor = (step - self.wsteps) / (self.tsteps - self.wsteps)
        return max(0.0, math.cos(cos_factor * (math.pi / 2)) ** 2)

    def lr_at(self, step: int) -> float:
        return self.base_lr * self.multiplier(step)


class ReduceLROnPlateau:
    """Min-mode plateau controller (reference: ClassifierExperiment.py:79-80)."""

    def __init__(self, base_lr: float, patience: int = 5, factor: float = 0.1, min_lr: float = 0.0):
        self.lr = base_lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.counter = 0

    def step(self, metric: float) -> float:
        if self.best is None or metric < self.best:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.counter = 0
        return self.lr


def create_scheduler(config):
    """Config -> schedule object (reference: ClassifierExperiment.py:77-82)."""
    name = config.scheduler.name
    base_lr = float(config.optimizer.config.learning_rate)
    if name == "cosine":
        return LinearWarmupCosineAnnealing(
            base_lr,
            total_steps=int(config.scheduler.config.epochs),
            warmup_steps=config.scheduler.config.warmup_epochs,
        )
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(base_lr, patience=int(config.scheduler.config.patience))
    raise ValueError(f"Unknown scheduler {name!r}")
