"""Task losses: masked weighted BCE for OVSSC / VOOL, pure JAX.

TPU-native re-architecture of the reference loss heads
(reference: train_ovssc.py:81-169, train_vool.py:118-206,
utils.py:727-747 get_bce_weight). Differences from the torch code:

- No OOM-chunking fallback (reference >500k-pt serial per-patch path,
  train_ovssc.py:90-123): chunking on TPU is done by the caller with
  ``lax.map`` when needed; the loss itself is one fused expression.
- get_bce_weight's per-row python loop (utils.py:744-746) is a vectorized
  ``where``.
- Parity notes: the OVSSC BCE averages over NON-ignored points only; the
  VOOL BCE is intentionally unmasked (reference quirk, train_vool.py:171-178
  computes loss on all points, only metrics are masked).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise numerically-stable binary cross entropy with logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def get_bce_weight(output_label_pts: jax.Array,
                   balance_positive_negative: bool) -> jax.Array:
    """(B, P, N) labels -> per-point weights (reference utils.py:727-747).

    With balancing, each (batch, patch) row weighs positives by
    1/frac_positive and negatives by 1/frac_negative.
    """
    labels = output_label_pts.astype(jnp.float32)
    if not balance_positive_negative:
        return jnp.ones_like(labels)
    frac_pos = labels.mean(axis=-1, keepdims=True)
    w_pos = 1.0 / (frac_pos + 1e-10)
    w_neg = 1.0 / (1.0 - frac_pos + 1e-10)
    return jnp.where(labels > 0, w_pos, w_neg)


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of ``values`` where ``mask`` is True (0 if empty)."""
    mask = mask.astype(values.dtype)
    total = (values * mask).sum()
    count = mask.sum()
    return total / jnp.maximum(count, 1.0)


def masked_mean_per_sample(values: jax.Array, mask: jax.Array) -> jax.Array:
    """(B, ...) masked mean over all non-batch axes -> (B,).

    Used by eval to report scalars per SAMPLE so sharded eval can drop
    wrap-pad duplicate samples from the logged means (the batch-level
    pmean cannot un-mix them)."""
    mask = mask.astype(values.dtype)
    axes = tuple(range(1, values.ndim))
    return (values * mask).sum(axes) / jnp.maximum(mask.sum(axes), 1.0)


def ovssc_loss(
    logits: jax.Array,
    output_label_pts: jax.Array,
    ignore_mask: jax.Array,
    balance_positive_negative: bool = False,
    per_sample: bool = False,
) -> dict:
    """OVSSC loss + accuracy (reference train_ovssc.py:125-150).

    ignore_mask = padding-label ∪ out-of-bounds ∪ out-of-frustum points.
    """
    labels = output_label_pts.astype(jnp.float32)
    weight = get_bce_weight(labels, balance_positive_negative)
    bce = bce_with_logits(logits.astype(jnp.float32), labels) * weight
    keep = ~ignore_mask
    loss = masked_mean(bce, keep)
    correct = ((logits > 0.0) == (labels > 0.5)).astype(jnp.float32)
    stats = {"loss": loss, "accuracy": masked_mean(correct, keep)}
    if per_sample:
        stats["loss_per_sample"] = masked_mean_per_sample(bce, keep)
        stats["accuracy_per_sample"] = masked_mean_per_sample(correct, keep)
    return stats


def vool_loss(
    logits: jax.Array,
    output_label_pts: jax.Array,
    ignore_mask: jax.Array,
    balance_positive_negative: bool = False,
    per_sample: bool = False,
) -> dict:
    """VOOL loss + accuracy (reference train_vool.py:164-186).

    NOTE: loss is computed over ALL points including ignored ones —
    faithful to the reference (train_vool.py:171-178); only the accuracy
    (and downstream metrics) use the ignore mask.
    """
    labels = output_label_pts.astype(jnp.float32)
    weight = get_bce_weight(labels, balance_positive_negative)
    bce = bce_with_logits(logits.astype(jnp.float32), labels) * weight
    loss = bce.mean()
    correct = ((logits > 0.0) == (labels > 0.5)).astype(jnp.float32)
    stats = {"loss": loss, "accuracy": masked_mean(correct, ~ignore_mask)}
    if per_sample:
        axes = tuple(range(1, bce.ndim))
        stats["loss_per_sample"] = bce.mean(axes)  # unmasked, like loss
        stats["accuracy_per_sample"] = masked_mean_per_sample(
            correct, ~ignore_mask
        )
    return stats


def ovssc_ignore_mask(
    padding_mask: jax.Array,
    out_of_bounds_pts: jax.Array,
    out_of_frustum_pts_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, P) padding x (B, P, N) masks -> (B, P, N) ignore mask
    (reference train_ovssc.py:126-136)."""
    ignore = padding_mask[..., None] | out_of_bounds_pts.astype(bool)
    if out_of_frustum_pts_mask is not None:
        ignore = ignore | out_of_frustum_pts_mask.astype(bool)
    return ignore
