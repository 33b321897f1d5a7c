"""Optimizer: Adam with the inverse-sqrt warmup transformer schedule.

Reference counterpart: the vendored Adam + `update_lr` in generator/train.py
and adam.py of jcyk/gtos (SURVEY.md §2.2 "Training driver", "Custom Adam /
LR utils"): lr = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5), gradient
clipping by global norm, optional decoupled weight decay. Expressed as optax
transforms so the whole update lives inside the jitted train step.
"""

from __future__ import annotations

import optax

from gtos_tpu.utils.config import TrainConfig


def inverse_sqrt_schedule(d_model: int, warmup_steps: int, scale: float = 1.0):
    """lr(step) = scale * d^-0.5 * min(step^-0.5, step * warmup^-1.5)."""
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0  # 1-indexed like the ref
        return scale * (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * (warmup_steps ** -1.5))

    return schedule


def make_optimizer(cfg: TrainConfig, d_model: int) -> optax.GradientTransformation:
    schedule = inverse_sqrt_schedule(d_model, cfg.warmup_steps, cfg.lr_scale)
    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps))
    tx = optax.chain(*chain)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx
