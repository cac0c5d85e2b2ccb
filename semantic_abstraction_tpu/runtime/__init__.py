from .losses import (
    bce_with_logits,
    get_bce_weight,
    masked_mean,
    ovssc_loss,
    vool_loss,
    ovssc_ignore_mask,
)
from .metrics import (
    iou,
    prediction_analysis,
    voxelize_points,
    point_and_voxel_stats,
    point_and_voxel_stats_jit,
    detailed_stats_frame,
)
from .schedule import make_schedule
from .train import (
    TrainState,
    make_optimizer,
    init_train_state,
    make_train_step,
    make_eval_step,
    FORWARD_LOSS,
    ovssc_forward_loss,
    vool_forward_loss,
)

__all__ = [
    "bce_with_logits",
    "get_bce_weight",
    "masked_mean",
    "ovssc_loss",
    "vool_loss",
    "ovssc_ignore_mask",
    "iou",
    "prediction_analysis",
    "voxelize_points",
    "point_and_voxel_stats",
    "point_and_voxel_stats_jit",
    "detailed_stats_frame",
    "make_schedule",
    "TrainState",
    "make_optimizer",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "FORWARD_LOSS",
    "ovssc_forward_loss",
    "vool_forward_loss",
]
