"""Sharded training step: the pjit equivalent of the reference's DDP loop.

TPU-native re-architecture of reference utils.py ``loop``/``train``
(:383-614): one jitted train step over a data mesh replaces
zero_grad/backward/clip/step + NCCL bucket allreduce. Gradient averaging
across chips is implicit in the sharded jit (XLA psum over ICI); grad-norm
clipping at 2.0 (reference utils.py:413-421) and the LAMB + HF-style
cosine-with-restarts schedule (utils.py:260-274) live inside the optax
chain.

The model forward runs in bf16 (``compute_dtype``) with fp32 params and
fp32 loss — the TPU-native replacement for the reference's (default-off)
AMP GradScaler (utils.py:291-293).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import lamb
from ..models.nets import (
    ClipSpatialVOOLConfig,
    SemAbs3DConfig,
    SemanticAwareOVSSCConfig,
    SemanticAwareVOOLConfig,
    SemAbsVOOLConfig,
    clip_spatial_vool_forward,
    semabs3d_forward,
    semabs_vool_forward,
    semantic_aware_ovssc_forward,
    semantic_aware_vool_forward,
)
from .losses import ovssc_ignore_mask, ovssc_loss, vool_loss
from .schedule import make_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    grad_max_norm: float = 2.0,
    lr_scheduler_type: str = "cosine_with_restarts",
    num_warmup_steps: int = 1024,
    num_training_steps: int = 1,
) -> optax.GradientTransformation:
    """clip(2.0) -> LAMB(schedule * lr): reference utils.py:260-274 +
    clip_grad_norm at utils.py:413-421."""
    sched = make_schedule(lr_scheduler_type, num_warmup_steps, num_training_steps)
    return optax.chain(
        optax.clip_by_global_norm(grad_max_norm),
        lamb(lambda step: lr * sched(step), weight_decay=weight_decay),
    )


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32))


# -- per-approach forward + loss --------------------------------------------


def ovssc_forward_loss(params, cfg: SemAbs3DConfig, batch: dict,
                       balance_positive_negative: bool = False,
                       compute_dtype=jnp.bfloat16,
                       per_sample: bool = False):
    """SemAbs3D OVSSC loss (reference train_ovssc.py:81-169)."""
    logits = semabs3d_forward(
        params, cfg,
        input_xyz_pts=batch["input_xyz_pts"],
        input_feature_pts=batch["input_feature_pts"],
        output_xyz_pts=batch["output_xyz_pts"],
        tsdf_vol=batch.get("tsdf_vol"),
        valid_mask=batch.get("input_valid_mask"),
        compute_dtype=compute_dtype,
    )
    ignore = ovssc_ignore_mask(
        batch["padding_mask"], batch["out_of_bounds_pts"],
        batch.get("out_of_frustum_pts_mask"),
    )
    stats = ovssc_loss(logits, batch["output_label_pts"], ignore,
                       balance_positive_negative, per_sample=per_sample)
    return stats["loss"], {**stats, "logits": logits, "ignore": ignore}


def semaware_ovssc_forward_loss(params, cfg: SemanticAwareOVSSCConfig, batch,
                                balance_positive_negative=False,
                                compute_dtype=jnp.bfloat16,
                                per_sample=False):
    logits = semantic_aware_ovssc_forward(
        params, cfg,
        input_xyz_pts=batch["input_xyz_pts"],
        input_feature_pts=batch["input_feature_pts"],
        output_xyz_pts=batch["output_xyz_pts"],
        semantic_class_features=batch["semantic_class_features"],
        tsdf_vol=batch.get("tsdf_vol"),
        valid_mask=batch.get("input_valid_mask"),
        compute_dtype=compute_dtype,
    )
    ignore = ovssc_ignore_mask(
        batch["padding_mask"], batch["out_of_bounds_pts"],
        batch.get("out_of_frustum_pts_mask"),
    )
    stats = ovssc_loss(logits, batch["output_label_pts"], ignore,
                       balance_positive_negative, per_sample=per_sample)
    return stats["loss"], {**stats, "logits": logits, "ignore": ignore}


def vool_forward_loss(params, cfg: SemAbsVOOLConfig, batch,
                      balance_positive_negative=False,
                      compute_dtype=jnp.bfloat16, per_sample=False):
    """SemAbsVOOL loss (reference train_vool.py:118-206)."""
    logits = semabs_vool_forward(
        params, cfg,
        input_xyz_pts=batch["input_xyz_pts"],
        input_target_saliency_pts=batch["input_target_saliency_pts"],
        input_reference_saliency_pts=batch["input_reference_saliency_pts"],
        output_xyz_pts=batch["output_xyz_pts"],
        spatial_relation_id=batch["spatial_relation_id"],
        tsdf_vol=batch.get("tsdf_vol"),
        valid_mask=batch.get("input_valid_mask"),
        compute_dtype=compute_dtype,
    )
    ignore = batch["padding_mask"][..., None] | batch["out_of_bounds_pts"].astype(bool)
    stats = vool_loss(logits, batch["output_label_pts"], ignore,
                      balance_positive_negative, per_sample=per_sample)
    return stats["loss"], {**stats, "logits": logits, "ignore": ignore}


def semaware_vool_forward_loss(params, cfg: SemanticAwareVOOLConfig, batch,
                               balance_positive_negative=False,
                               compute_dtype=jnp.bfloat16, per_sample=False):
    logits = semantic_aware_vool_forward(
        params, cfg,
        input_xyz_pts=batch["input_xyz_pts"],
        input_rgb_pts=batch["input_rgb_pts"],
        output_xyz_pts=batch["output_xyz_pts"],
        spatial_relation_id=batch["spatial_relation_id"],
        target_obj_features=batch["target_obj_features"],
        reference_obj_features=batch["reference_obj_features"],
        tsdf_vol=batch.get("tsdf_vol"),
        valid_mask=batch.get("input_valid_mask"),
        compute_dtype=compute_dtype,
    )
    ignore = batch["padding_mask"][..., None] | batch["out_of_bounds_pts"].astype(bool)
    stats = vool_loss(logits, batch["output_label_pts"], ignore,
                      balance_positive_negative, per_sample=per_sample)
    return stats["loss"], {**stats, "logits": logits, "ignore": ignore}


def clipspatial_vool_forward_loss(params, cfg: ClipSpatialVOOLConfig, batch,
                                  balance_positive_negative=False,
                                  compute_dtype=jnp.bfloat16, per_sample=False):
    logits = clip_spatial_vool_forward(
        params, cfg,
        input_xyz_pts=batch["input_xyz_pts"],
        input_description_saliency_pts=batch["input_description_saliency_pts"],
        output_xyz_pts=batch["output_xyz_pts"],
        tsdf_vol=batch.get("tsdf_vol"),
        valid_mask=batch.get("input_valid_mask"),
        compute_dtype=compute_dtype,
    )
    ignore = batch["padding_mask"][..., None] | batch["out_of_bounds_pts"].astype(bool)
    stats = vool_loss(logits, batch["output_label_pts"], ignore,
                      balance_positive_negative, per_sample=per_sample)
    return stats["loss"], {**stats, "logits": logits, "ignore": ignore}


FORWARD_LOSS = {
    "ovssc/semantic_abstraction": ovssc_forward_loss,
    "ovssc/semantic_aware": semaware_ovssc_forward_loss,
    "vool/semantic_abstraction": vool_forward_loss,
    "vool/semantic_aware": semaware_vool_forward_loss,
    "vool/clip_spatial": clipspatial_vool_forward_loss,
}


def make_train_step(
    forward_loss: Callable,
    cfg,
    tx: optax.GradientTransformation,
    mesh=None,
    axis_name: str = "data",
    balance_positive_negative: bool = False,
    compute_dtype=jnp.bfloat16,
    donate: bool = True,
):
    """Build the jitted (optionally multi-chip) train step.

    Multi-chip runs through ``shard_map``: every device executes the FULL
    forward/backward on its LOCAL batch shard and gradients/metrics are
    pmean'ed over the data axis (DDP semantics, reference utils.py:256).
    shard_map (rather than sharded-jit) is load-bearing: the model
    interior uses ``lax.map`` over batch-derived axes (UNet patch
    chunking, the grid-sampler's per-row VJP), and a scan over a
    GLOBALLY-sharded axis cannot be partitioned — inside shard_map those
    scans see only the local shard. Returns (state, scalar stats incl.
    grad_norm — reference logs it per step, utils.py:320-326).
    """

    def step_fn(state: TrainState, batch: dict):
        def loss_fn(p):
            loss, aux = forward_loss(
                p, cfg, batch, balance_positive_negative, compute_dtype
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        accuracy = aux["accuracy"]
        if mesh is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            accuracy = jax.lax.pmean(accuracy, axis_name)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        stats = {
            "loss": loss,
            "accuracy": accuracy,
            "grad_norm": grad_norm,
        }
        return new_state, stats

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import PartitionSpec as P

    sharded = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_step(forward_loss: Callable, cfg, mesh=None, axis_name="data",
                   compute_dtype=jnp.bfloat16):
    """Jitted eval forward returning (loss stats, logits, ignore mask).

    Multi-chip evaluation also runs under shard_map (see make_train_step);
    per-point outputs come back sharded on the data axis, scalars pmean'd.
    """

    def step_fn(params, batch):
        _, aux = forward_loss(params, cfg, batch, False, compute_dtype,
                              per_sample=True)
        if mesh is not None:
            aux = dict(aux)
            aux["loss"] = jax.lax.pmean(aux["loss"], axis_name)
            aux["accuracy"] = jax.lax.pmean(aux["accuracy"], axis_name)
        return aux

    if mesh is None:
        return jax.jit(step_fn)
    from jax.sharding import PartitionSpec as P

    out_specs = {
        "loss": P(), "accuracy": P(), "logits": P(axis_name),
        "ignore": P(axis_name),
        # per-sample scalars stay sharded so the host can drop wrap-pad
        # duplicate samples from the logged means
        "loss_per_sample": P(axis_name), "accuracy_per_sample": P(axis_name),
    }
    sharded = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
