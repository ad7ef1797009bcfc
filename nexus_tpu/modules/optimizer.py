"""Optimizer & LR-schedule factories over optax
(parity: Nexus/modules/optimizer.py:4-32, plus the DeepSpeed WarmupDecayLR
schedule used by the reference's ds_stage*.json configs).
"""

from __future__ import annotations

from typing import Optional

import optax


def get_optimizer(
    name: str,
    learning_rate: float = 1e-3,
    weight_decay: float = 0.0,
    schedule: Optional[optax.Schedule] = None,
    **kwargs,
) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else learning_rate
    name = name.lower()
    if name == "adam":
        return optax.adam(lr, **kwargs)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay, **kwargs)
    if name == "sgd":
        return optax.sgd(lr, **kwargs)
    if name == "momentum":
        return optax.sgd(lr, momentum=kwargs.pop("momentum", 0.9), **kwargs)
    if name == "adagrad":
        return optax.adagrad(lr, **kwargs)
    if name == "rmsprop":
        return optax.rmsprop(lr, **kwargs)
    if name == "lamb":
        return optax.lamb(lr, weight_decay=weight_decay, **kwargs)
    if name == "adafactor":
        return optax.adafactor(lr, **kwargs)
    if name == "lion":
        return optax.lion(lr, weight_decay=weight_decay, **kwargs)
    raise ValueError(f"unknown optimizer {name!r}")


def get_lr_scheduler(
    name: Optional[str] = None,
    learning_rate: float = 1e-3,
    warmup_steps: int = 0,
    total_steps: int = 0,
    min_lr: float = 0.0,
    **kwargs,
) -> Optional[optax.Schedule]:
    """Build an optax schedule; None/'constant' returns None (constant LR),
    mirroring the reference's placeholder get_lr_scheduler."""
    if name is None or name in ("none", "constant"):
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return None
    name = name.lower()
    if name in ("linear", "warmup_decay", "warmupdecaylr"):
        return optax.warmup_cosine_decay_schedule(  # cosine ~ smooth decay; see below
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=min_lr,
        ) if name != "linear" else optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                optax.linear_schedule(learning_rate, min_lr, max(total_steps - warmup_steps, 1)),
            ],
            [max(warmup_steps, 1)],
        )
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=min_lr,
        )
    if name == "exponential":
        return optax.exponential_decay(
            learning_rate,
            transition_steps=kwargs.get("transition_steps", 1000),
            decay_rate=kwargs.get("decay_rate", 0.96),
        )
    raise ValueError(f"unknown lr scheduler {name!r}")
