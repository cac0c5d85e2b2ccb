"""LAMB optimizer as an optax GradientTransformation, reference-faithful.

Matches the semantics of the reference's vendored Lamb
(reference: arm/optim/lamb.py:26-127) rather than ``optax.lamb``:

- NO debiasing of the Adam moments (lamb.py:103-106).
- weight_norm = ||p||_2 clamped to [0, 10] (lamb.py:108).
- adam_step = m / (sqrt(v) + eps) + weight_decay * p (decay inside the
  trust-ratio numerator, not decoupled).
- trust_ratio = weight_norm / adam_norm, 1 when either norm is 0
  (lamb.py:112-118); update = -lr * trust_ratio * adam_step.

Defaults mirror utils.py:260-266: lr 1e-3, betas (0.9, 0.999), eps 1e-6,
weight_decay 1e-5. ``adam=True`` forces trust_ratio = 1.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LambState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def lamb(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    adam: bool = False,
    clamp_weight_norm: float = 10.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        return LambState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lamb requires params")
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates
        )
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def leaf_update(m, v, p):
            adam_step = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0:
                adam_step = adam_step + weight_decay * p
            if adam:
                trust_ratio = 1.0
            else:
                weight_norm = jnp.clip(
                    jnp.linalg.norm(p.reshape(-1)), 0.0, clamp_weight_norm
                )
                adam_norm = jnp.linalg.norm(adam_step.reshape(-1))
                trust_ratio = jnp.where(
                    (weight_norm == 0.0) | (adam_norm == 0.0),
                    1.0,
                    weight_norm / jnp.maximum(adam_norm, 1e-30),
                )
            return -lr * trust_ratio * adam_step

        new_updates = jax.tree_util.tree_map(leaf_update, mu, nu, params)
        return new_updates, LambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
