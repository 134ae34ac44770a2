"""Optimizer + LR schedule matching the reference recipe.

AdamW lr 5e-4, cosine warmup for 2000 steps then exponential decay
0.99998^(t - warmup) floored at 0.02 of peak (UniSE model/model.py:338-351,
conf/config.yaml:112-118); grad-clip 5.0 (train config)."""
from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_exp_decay_schedule(
    peak_lr: float = 5e-4,
    warmup_steps: int = 2000,
    step_decay: float = 0.99998,
    min_factor: float = 0.02,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 0.5 * (1 + jnp.cos(jnp.pi * (1 - step / warmup_steps)))
        decay = jnp.maximum(step_decay ** (step - warmup_steps), min_factor)
        return peak_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def make_optimizer(
    peak_lr: float = 5e-4,
    warmup_steps: int = 2000,
    step_decay: float = 0.99998,
    min_factor: float = 0.02,
    grad_clip: float = 5.0,
    weight_decay: float = 0.01,
):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            warmup_exp_decay_schedule(peak_lr, warmup_steps, step_decay, min_factor),
            weight_decay=weight_decay,
        ),
    )
