"""LR schedules matching HF transformers' ``get_scheduler`` semantics.

The reference trains with ``get_scheduler("cosine_with_restarts",
num_warmup_steps=1024, num_training_steps=epochs*len(ds)//batch)``
(reference: utils.py:267-274). These reproduce the lr-lambda math of
transformers' schedules as optax-compatible ``step -> scale`` callables
(multiply by base lr in the optimizer).
"""
from __future__ import annotations

import math


def warmup_cosine_with_restarts(num_warmup_steps: int, num_training_steps: int,
                                num_cycles: int = 1):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, float(num_warmup_steps))
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, float(num_training_steps - num_warmup_steps)
        )
        cos = jnp.maximum(
            0.0,
            0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * progress) % 1.0))),
        )
        cos = jnp.where(progress >= 1.0, 0.0, cos)
        return jnp.where(step < num_warmup_steps, warmup, cos)

    return schedule


def warmup_linear(num_warmup_steps: int, num_training_steps: int):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, float(num_warmup_steps))
        decay = jnp.maximum(
            0.0,
            (num_training_steps - step)
            / jnp.maximum(1.0, float(num_training_steps - num_warmup_steps)),
        )
        return jnp.where(step < num_warmup_steps, warmup, decay)

    return schedule


def warmup_constant(num_warmup_steps: int):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        return jnp.minimum(1.0, step / jnp.maximum(1.0, float(num_warmup_steps)))

    return schedule


def warmup_cosine(num_warmup_steps: int, num_training_steps: int,
                  num_cycles: float = 0.5):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, float(num_warmup_steps))
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, float(num_training_steps - num_warmup_steps)
        )
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return jnp.where(step < num_warmup_steps, warmup, cos)

    return schedule


def constant():
    return lambda step: 1.0


def make_schedule(name: str, num_warmup_steps: int, num_training_steps: int):
    """Dispatch matching the reference --lr_scheduler_type choices
    (utils.py:101-110)."""
    if name == "constant":
        return constant()
    if name == "constant_with_warmup":
        return warmup_constant(num_warmup_steps)
    if name == "linear":
        return warmup_linear(num_warmup_steps, num_training_steps)
    if name == "cosine":
        return warmup_cosine(num_warmup_steps, num_training_steps)
    if name == "cosine_with_restarts":
        return warmup_cosine_with_restarts(num_warmup_steps, num_training_steps)
    raise ValueError(f"unknown scheduler {name!r}")
