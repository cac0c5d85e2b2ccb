"""Experiment orchestration: setup, train/eval loops, logging, resume.

TPU-native re-architecture of the reference experiment runtime
(reference: utils.py — setup_experiment :122-215, loop :383-471,
train :474-614). Structure kept (per-split datasets, tensorboard writers,
epoch loop with eval every eval_freq, latest + periodic checkpoints,
detailed-stats dataframes, best-cutoff epoch report); mechanics replaced:

- DDP/NCCL -> one jitted train step over a data Mesh (parallel/mesh.py);
  scalar stats come back merged (XLA psum), no all_reduce calls.
- The per-cutoff python eval loop -> one vmapped cutoff sweep on device
  (metrics.point_and_voxel_stats).
- torch DataLoader -> data.DataLoader thread prefetcher.
- The reference's swallow-and-continue split loop (utils.py:563-565) is
  kept: a failing split logs and moves on.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import pickle
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    DataConfig,
    DataLoader,
    ObjectLocalizationDataset,
    SceneCompletionDataset,
    ShardedSampler,
)
from ..models import (
    ClipSpatialVOOLConfig,
    SemAbs3DConfig,
    SemanticAwareOVSSCConfig,
    SemanticAwareVOOLConfig,
    SemAbsVOOLConfig,
    init_clip_spatial_vool,
    init_semabs3d,
    init_semabs_vool,
    init_semantic_aware_ovssc,
    init_semantic_aware_vool,
    count_params,
)
from .checkpoint import save_checkpoint
from .metrics import detailed_stats_frame, point_and_voxel_stats_jit
from .train import (
    TrainState,
    clipspatial_vool_forward_loss,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    ovssc_forward_loss,
    semaware_ovssc_forward_loss,
    semaware_vool_forward_loss,
    vool_forward_loss,
)

APPROACHES = {
    ("ovssc", "semantic_abstraction"): (
        ovssc_forward_loss, init_semabs3d,
    ),
    ("ovssc", "semantic_aware"): (
        semaware_ovssc_forward_loss, init_semantic_aware_ovssc,
    ),
    ("vool", "semantic_abstraction"): (
        vool_forward_loss, init_semabs_vool,
    ),
    ("vool", "semantic_aware"): (
        semaware_vool_forward_loss, init_semantic_aware_vool,
    ),
    ("vool", "clip_spatial"): (
        clipspatial_vool_forward_loss, init_clip_spatial_vool,
    ),
}

DEVICE_KEYS = {
    "ovssc": (
        "input_xyz_pts", "input_feature_pts", "output_xyz_pts",
        "output_label_pts", "out_of_bounds_pts", "out_of_frustum_pts_mask",
        "padding_mask", "semantic_class_features",
    ),
    "vool": (
        "input_xyz_pts", "input_target_saliency_pts",
        "input_reference_saliency_pts", "input_description_saliency_pts",
        "input_rgb_pts", "output_xyz_pts", "output_label_pts",
        "out_of_bounds_pts", "out_of_frustum_pts_mask", "padding_mask",
        "spatial_relation_id",
    ),
}


def _bounds_from_args(args):
    """argparse --scene_bounds arrives flat (6 floats) or nested."""
    b = args.scene_bounds
    return (((b[0], b[1], b[2]), (b[3], b[4], b[5])) if len(b) == 6
            else tuple(map(tuple, b)))


def completion_cfg_from_args(
    args, network_inputs=None, output_dim=1, decoder_concat_xyz_pts=None
) -> SemAbs3DConfig:
    bounds = _bounds_from_args(args)
    return SemAbs3DConfig(
        voxel_shape=tuple(args.voxel_shape),
        scene_bounds=bounds,
        unet_num_channels=args.unet_num_channels,
        unet_f_maps=args.unet_f_maps,
        unet_num_groups=args.unet_num_groups,
        unet_num_levels=args.unet_num_levels,
        network_inputs=tuple(network_inputs or args.network_inputs),
        use_pts_feat_extractor=args.use_pts_feat_extractor,
        pts_feat_extractor_hidden_dim=args.pts_feat_extractor_hidden_dim,
        reduce_method=args.reduce_method,
        output_dim=output_dim,
        decoder_concat_xyz_pts=(
            args.decoder_concat_xyz_pts
            if decoder_concat_xyz_pts is None
            else decoder_concat_xyz_pts
        ),
    )


def model_cfg_from_args(task: str, approach: str, args):
    # VOOL quirk: the reference pops --decoder_concat_xyz_pts from the
    # kwargs before building the inner SemAbs3D (net.py:469-486, :640-648),
    # whose own default is False (net.py:334) — so every reference VOOL
    # COMPLETION decoder has concat_xyz=False regardless of the flag; only
    # the outer spatial_sampler consumes it.
    if task == "ovssc":
        if approach == "semantic_aware":
            return SemanticAwareOVSSCConfig(
                completion=completion_cfg_from_args(
                    args, network_inputs=["rgb"], output_dim=512
                ),
                pointing_method=args.pointing_method,
            )
        return completion_cfg_from_args(args)
    if approach == "semantic_aware":
        return SemanticAwareVOOLConfig(
            completion=completion_cfg_from_args(
                args, network_inputs=["rgb"], output_dim=args.pointing_dim,
                decoder_concat_xyz_pts=False,
            ),
            pointing_method=args.pointing_method,
            pointing_dim=args.pointing_dim,
        )
    if approach == "clip_spatial":
        return ClipSpatialVOOLConfig(
            completion=completion_cfg_from_args(
                args, decoder_concat_xyz_pts=False
            ),
            decoder_concat_xyz_pts=args.decoder_concat_xyz_pts,
        )
    return SemAbsVOOLConfig(
        # chunk=2/full-remat: the two-stream step OOMs a v5e at the chunk-4
        # default (see SemAbsVOOLConfig docstring); keep the CLI path on the
        # same memory plan as the dataclass default
        completion=dataclasses.replace(
            completion_cfg_from_args(args, decoder_concat_xyz_pts=False),
            unet_batch_chunk=2, unet_remat_policy="full",
        ),
        pointing_method=args.pointing_method,
        pointing_dim=args.pointing_dim,
        decoder_concat_xyz_pts=args.decoder_concat_xyz_pts,
    )


def data_cfg_from_args(args) -> DataConfig:
    bounds = _bounds_from_args(args)
    return DataConfig(
        scene_bounds=bounds,
        network_inputs=tuple(args.network_inputs),
        domain_randomization=args.domain_randomization,
        num_input_pts=args.num_input_pts,
        num_output_pts=args.num_output_pts,
        num_patches=args.num_patches,
        num_descs=args.num_descs,
        tsdf_shape=tuple(args.voxel_shape),
        saliency_config=args.saliency_config,
        subtract_mean_relevancy=args.subtract_mean_relevancy,
        offset_patch_mask=args.offset_patch_mask,
        patch_mask_cutoff=args.patch_mask_cutoff,
        saliency_vmin=args.saliency_vmin,
        balance_spatial_relations=args.balance_spatial_relations,
        balance_spatial_sampling=args.balance_spatial_sampling,
        always_replace_subsample_pts=args.always_replace_subsample_pts,
        xyz_pts_noise=args.xyz_pts_noise,
        dr_pos=args.dr_pos,
        dr_orn=args.dr_orn,
        dr_scale=args.dr_scale,
        seed=args.seed,
    )


def setup_experiment(args, task: str, approach: str,
                     return_vis: bool = False, mesh=None) -> dict:
    """Split loading + per-split datasets + model/optimizer/state
    (reference utils.py:122-215 + get_net :237-294).

    Pass the actual ``mesh`` train() will run on so the LR schedule's
    step count is sized from the real global batch; otherwise it is
    derived from args (correct for the CLIs, which build the mesh from
    args.num_devices)."""
    split_name = "ssc_split.pkl" if task == "ovssc" else "vool_split.pkl"
    split_path = os.path.join(args.file_path, split_name)
    with open(split_path, "rb") as f:
        splits = pickle.load(f)
    logging.info(
        "DATASET AT %s | %s", args.file_path,
        " | ".join(f"{k}: {len(v)}" for k, v in splits.items()),
    )
    dataset_class = (
        SceneCompletionDataset if task == "ovssc" else ObjectLocalizationDataset
    )
    dcfg = data_cfg_from_args(args)
    datasets = {}
    for k, paths in splits.items():
        if len(paths) == 0:
            continue
        split_dcfg = dataclasses.replace(
            dcfg,
            domain_randomization=(
                args.domain_randomization if k == "train" else False
            ),
        )
        datasets[k] = dataset_class(
            file_path=args.file_path,
            scene_paths=paths,
            cfg=split_dcfg,
            return_vis=(k != "train") or return_vis,
            domain_randomized_rgb=(k == "unseen_instances_dr"),
            use_synonyms=(k == "unseen_instances_synonyms"),
        )

    cfg = model_cfg_from_args(task, approach, args)
    forward_loss, init_fn = APPROACHES[(task, approach)]
    params = init_fn(jax.random.PRNGKey(args.seed), cfg)
    logging.info("NUM PARAMS: %d", count_params(params))
    # --batch_size is PER-DEVICE (the reference's batch-1-per-GPU regime,
    # README.md:241-255): the global batch scales with the mesh
    from ..parallel import mesh_size_from_args

    n_mesh = (int(mesh.devices.size) if mesh is not None
              else mesh_size_from_args(args))
    global_batch = max(args.batch_size, 1) * n_mesh
    steps_per_epoch = max(1, len(datasets.get("train", [])) // global_batch)
    tx = make_optimizer(
        lr=args.lr,
        weight_decay=args.weight_decay,
        grad_max_norm=args.grad_max_norm,
        lr_scheduler_type=args.lr_scheduler_type,
        num_warmup_steps=args.num_warmup_steps,
        num_training_steps=args.epochs * steps_per_epoch,
    )
    state = init_train_state(params, tx)
    start_epoch = 0
    if args.load:
        logging.info("loading from %s", args.load)
        # handles both our flax checkpoints and reference .pth directly
        from .checkpoint import load_net_checkpoint

        state, start_epoch = load_net_checkpoint(args.load, state, task,
                                                 approach)
    return {
        "splits": splits,
        "datasets": datasets,
        "cfg": cfg,
        "forward_loss": forward_loss,
        "tx": tx,
        "state": state,
        "start_epoch": start_epoch,
        "task": task,
        "approach": approach,
    }


# float arrays safe to ship narrow when a wire dtype is set: coordinates
# (quantization ~1e-3 at scene scale) and relevancy features (stored f16 in
# the HDF5 schema anyway, generate_relevancy.py wire format)
_WIRE_COMPRESSIBLE = frozenset({
    "input_xyz_pts", "output_xyz_pts", "input_feature_pts",
    "input_target_saliency_pts", "input_reference_saliency_pts",
    "input_description_saliency_pts", "input_rgb_pts",
})


def device_batch(batch: dict, task: str, mesh=None,
                 text_encoder: Optional[Callable] = None,
                 wire_dtype=None) -> dict:
    """numpy batch -> device arrays for the jitted step; computes the
    semaware text features host-side (reference net.py:594-602).

    ``wire_dtype`` (e.g. np.float16) narrows the float arrays in
    ``_WIRE_COMPRESSIBLE`` before the host->device transfer — a
    tunnel-bandwidth mitigation (the 128^3 train batch is ~30 MB f32; a
    remote-tunneled chip moves 20-100 MB/s where a real TPU host's PCIe
    moves GB/s). 0/1 label arrays always ship uint8 (lossless — the loss
    casts to f32 on device, losses.py:79).
    """
    out = {}
    for k in DEVICE_KEYS[task]:
        if k in batch and isinstance(batch[k], np.ndarray):
            v = batch[k]
            if k == "output_label_pts" and v.dtype != np.uint8:
                v = v.astype(np.uint8)
            elif (wire_dtype is not None and k in _WIRE_COMPRESSIBLE
                  and v.dtype == np.float32):
                v = v.astype(wire_dtype)
            out[k] = v
    if "tsdf_vol" in batch and isinstance(batch["tsdf_vol"], np.ndarray):
        tv = batch["tsdf_vol"]
        if tv.ndim == 4:  # (B, gx, gy, gz)
            out["tsdf_vol"] = tv
    if text_encoder is not None and task == "vool" and "target_obj_name" in batch:
        t = [n for row in batch["target_obj_name"] for n in row]
        r = [n for row in batch["reference_obj_name"] for n in row]
        b = len(batch["target_obj_name"])
        out["target_obj_features"] = np.asarray(text_encoder(t)).reshape(b, -1, 512)
        out["reference_obj_features"] = np.asarray(text_encoder(r)).reshape(b, -1, 512)
    if mesh is not None:
        # hand the numpy dict straight to shard_batch: device_put with the
        # sharding does ONE host->device transfer per array; jnp.asarray
        # first would stage everything on device 0 and reshard (and the
        # multi-process assembly would even read it back to host)
        from ..parallel import shard_batch

        return shard_batch(out, mesh)
    return {k: jnp.asarray(v) for k, v in out.items()}


def eval_cutoffs_for(task: str, detailed: bool):
    if detailed:
        return tuple(float(c) for c in np.arange(-2.5, 0, 0.1))
    return (0.0,) if task == "ovssc" else (-2.0,)


def _local_rows(arr) -> np.ndarray:
    """This process's batch rows of a possibly cross-process-sharded array
    (in local index order). Fully-addressable arrays pass straight through
    np.asarray, so single-host behavior is unchanged.

    The sharded axis is DETECTED, not assumed: the detailed-stat arrays
    are (C, B, P) with the batch on axis 1 (cutoffs replicated), while the
    per-sample scalars are (B,) — sorting/concatenating on a replicated
    axis would silently duplicate it."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        shards = list(arr.addressable_shards)
        axis = 0
        for d in range(arr.ndim):
            starts = {s.index[d].start or 0 for s in shards}
            if len(starts) > 1:
                axis = d
                break
        shards.sort(key=lambda s: s.index[axis].start or 0)
        seen, keep = set(), []
        for s in shards:  # drop replicated duplicates of the same slice
            st = s.index[axis].start or 0
            if st not in seen:
                seen.add(st)
                keep.append(s)
        return np.concatenate([np.asarray(s.data) for s in keep], axis=axis)
    return np.asarray(arr)


def _sync_padded_shapes(batch: dict, task: str) -> dict:
    """Agree on device-array shapes across processes before
    ``make_array_from_process_local_data`` (multi-host eval).

    collate_padded pads ragged eval samples to per-PROCESS-local maxima;
    with >1 process the local shapes can disagree and the global-array
    assembly (and traced program) would diverge across hosts. Gather the
    local maxima and pad every device key to the global max (same fill
    rules as the loader's padding)."""
    from ..data.loader import _PAD_VALUES
    from ..parallel.mesh import all_gather_host_objects

    keys = [k for k in DEVICE_KEYS[task]
            if k in batch and isinstance(batch[k], np.ndarray)]
    local = {k: batch[k].shape[1:] for k in keys}
    target = {k: np.asarray(s) for k, s in local.items()}
    for other in all_gather_host_objects(local):
        for k, s in other.items():
            if k in target:
                target[k] = np.maximum(target[k], np.asarray(s))
    out = dict(batch)
    for k in keys:
        t = tuple(int(x) for x in target[k])
        if t != batch[k].shape[1:]:
            pads = [(0, 0)] + [
                (0, a - b) for a, b in zip(t, batch[k].shape[1:])
            ]
            out[k] = np.pad(batch[k], pads,
                            constant_values=_PAD_VALUES.get(k, 0))
    # the string-list meta fields (patch_labels, *_obj_name,
    # spatial_relation_name) pair row-for-row with padding_mask's desc
    # axis in detailed_stats_frame — pad them to the same global width or
    # the DataFrame columns diverge in length across processes
    if "padding_mask" in target:
        from ..data.loader import _PAD_STRINGS

        p_global = int(target["padding_mask"][0])
        for k, fill in _PAD_STRINGS.items():
            if k in out and isinstance(out[k], list):
                out[k] = [
                    list(row) + [fill] * (p_global - len(row))
                    for row in out[k]
                ]
    return out


def run_eval_split(
    state: TrainState,
    eval_step,
    loader: DataLoader,
    task: str,
    scene_bounds,
    cutoffs,
    voxel_shapes=((32, 32, 32),),
    text_encoder=None,
    mesh=None,
    max_batches: Optional[int] = None,
    wire_dtype=None,
):
    """Eval loop over a split -> (scalar means, detailed-stats DataFrame)."""
    import pandas as pd

    frames = []
    scalars = {"loss": [], "accuracy": []}
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        if jax.process_count() > 1:
            batch = _sync_padded_shapes(batch, task)
        db = device_batch(batch, task, mesh, text_encoder,
                          wire_dtype=wire_dtype)
        aux = eval_step(state.params, db)
        sample_pad_early = np.asarray(
            batch.get("_sample_pad", np.zeros(0, bool))
        )
        # per-SAMPLE scalars, wrap-pad duplicates dropped: batch-level
        # pmeans would bias the logged means toward duplicated scenes
        # (the detailed stats already NaN them; the scalars must too)
        lps = _local_rows(aux["loss_per_sample"])
        aps = _local_rows(aux["accuracy_per_sample"])
        valid = (~sample_pad_early if sample_pad_early.size
                 else np.ones(len(lps), bool))
        scalars["loss"].extend(np.asarray(lps)[valid].tolist())
        scalars["accuracy"].extend(np.asarray(aps)[valid].tolist())
        stats = point_and_voxel_stats_jit(
            aux["logits"], db["output_label_pts"], db["output_xyz_pts"],
            aux["ignore"], cutoffs, scene_bounds, voxel_shapes,
        )
        # multi-host: stats batch rows are globally sharded; keep only THIS
        # process's rows (in local order) so they pair with the local host
        # batch's meta/pad below. Single-process: plain np.asarray.
        stats = {k: _local_rows(v) for k, v in stats.items()}
        sample_pad = np.asarray(batch.get("_sample_pad", np.zeros(0, bool)))
        if task == "ovssc":
            meta = {
                "scene_id": [
                    sid for sid, row in zip(batch["scene_id"], batch["patch_labels"])
                    for _ in row
                ],
                "label": [l for row in batch["patch_labels"] for l in row],
            }
            pad = np.asarray(batch["padding_mask"])
        else:
            meta = {
                "scene_id": [
                    sid for sid, row in zip(
                        batch["scene_id"], batch["spatial_relation_name"]
                    ) for _ in row
                ],
                "target_obj_name": [
                    n for row in batch["target_obj_name"] for n in row
                ],
                "reference_obj_name": [
                    n for row in batch["reference_obj_name"] for n in row
                ],
                "spatial_relation_name": [
                    s for row in batch["spatial_relation_name"] for s in row
                ],
            }
            pad = np.asarray(batch["padding_mask"])
        if sample_pad.size:
            # duplicated wrap-pad samples (full-batch sharded eval) are
            # NaN'd like padding so sharded stats == single-device stats
            pad = pad | sample_pad[:, None]
        frames.append(detailed_stats_frame(stats, cutoffs, meta, pad))
    detailed = (
        pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    )
    if jax.process_count() > 1:
        # multi-host: every process holds its scene shard's frames; gather
        # them all (reference all_gather_object, utils.py:433-435)
        from ..parallel.mesh import all_gather_host_objects

        parts = [p for p in all_gather_host_objects(detailed) if len(p)]
        detailed = (
            pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
        )
        # scalar samples too (reference all_reduces scalar stats across
        # ranks, utils.py:427-431) — every process then logs identical,
        # global-sample means
        gathered = all_gather_host_objects(scalars)
        scalars = {
            k: [x for part in gathered for x in part[k]] for k in scalars
        }
    means = {k: float(np.mean(v)) if v else float("nan") for k, v in scalars.items()}
    return means, detailed


def train(
    args,
    setup: dict,
    mesh=None,
    text_encoder: Optional[Callable] = None,
    log_dir: Optional[str] = None,
    max_steps_per_epoch: Optional[int] = None,
):
    """Epoch loop (reference utils.py:474-614): train every epoch, other
    splits every eval_freq; tensorboard scalars; latest + periodic ckpts;
    cumulative detailed_stats.pkl."""
    import pandas as pd

    task = setup["task"]
    cfg = setup["cfg"]
    state = setup["state"]
    tx = setup["tx"]
    forward_loss = setup["forward_loss"]
    log_dir = log_dir or args.log
    os.makedirs(log_dir, exist_ok=True)
    compute_dtype = (
        jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    )
    wire_dtype = (np.float16 if getattr(args, "wire_dtype", "float32")
                  == "float16" else None)
    train_step = make_train_step(
        forward_loss, cfg, tx, mesh=mesh,
        balance_positive_negative=args.balance_positive_negative,
        compute_dtype=compute_dtype,
    )
    eval_step = make_eval_step(forward_loss, cfg, mesh=mesh,
                               compute_dtype=compute_dtype)

    writers = {}
    if jax.process_index() == 0:  # non-rank0 logging silenced like the
        try:                      # reference (utils.py:139-142)
            from tensorboardX import SummaryWriter

            writers = {
                k: SummaryWriter(os.path.join(log_dir, k))
                for k in setup["datasets"]
            }
        except ImportError:
            pass

    # tracing/profiling (SURVEY §5: the reference has only a wall-clock
    # print; here SEMABS_PROFILE_DIR=<dir> captures a jax.profiler trace of
    # the first training steps, viewable in tensorboard/xprof)
    profile_dir = os.environ.get("SEMABS_PROFILE_DIR")
    profile_steps = int(os.environ.get("SEMABS_PROFILE_STEPS", "3"))
    profile_active = False
    profile_stop_at = -1

    detailed_path = os.path.join(log_dir, "detailed_stats.pkl")
    all_detailed = []
    if os.path.exists(detailed_path):
        with open(detailed_path, "rb") as f:
            prev = pickle.load(f)
            if isinstance(prev, pd.DataFrame):
                all_detailed.append(prev)

    bounds = setup["datasets"][next(iter(setup["datasets"]))].cfg.scene_bounds
    global_step = int(state.step)
    # multi-chip batching: --batch_size is per-device; the mesh scales the
    # global batch and each PROCESS loads only its shard of the index space
    # (torchrun's DistributedSampler regime, reference utils.py:506-512)
    n_mesh = 1 if mesh is None else int(mesh.devices.size)
    global_batch = max(args.batch_size, 1) * n_mesh
    n_proc, proc_id = jax.process_count(), jax.process_index()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} (batch_size {args.batch_size} x "
            f"{n_mesh} mesh devices) must divide the {n_proc} processes"
        )
    local_batch = global_batch // n_proc
    # log-flush cadence: buffering device scalars keeps the host from
    # syncing on every step, so dispatch runs ahead of the device
    log_flush = 16
    for epoch in range(setup["start_epoch"], args.epochs):
        for split, ds in setup["datasets"].items():
            is_train = split == "train"
            if not is_train and epoch % args.eval_freq != 0:
                continue
            try:
                sampler = ShardedSampler(
                    len(ds), num_shards=n_proc, shard_id=proc_id,
                    shuffle=is_train, seed=args.seed, drop_last=is_train,
                )
                # eval batches need static-shape padding whenever samples
                # are stacked (>1 per batch: return_vis eval samples are
                # ragged) — not only when a mesh shards them; wrap-padded
                # full batches keep the compiled shapes unique and their
                # duplicates are NaN'd/dropped downstream
                pad_eval = (not is_train) and (
                    mesh is not None or local_batch > 1
                )
                loader = DataLoader(
                    ds, batch_size=local_batch,
                    num_workers=args.num_workers, sampler=sampler,
                    drop_last=is_train,
                    pad_to_full_batches=pad_eval,
                    pad_static_shapes=pad_eval,
                )
                loader.set_epoch(epoch)
                if is_train:
                    t_start = time.time()
                    losses = []
                    pending = []

                    def flush():
                        for gs, st in pending:
                            vals = {k: float(v) for k, v in st.items()}
                            losses.append(vals["loss"])
                            if writers:
                                for k, v in vals.items():
                                    writers[split].add_scalar(k, v, gs)
                        pending.clear()

                    for bi, batch in enumerate(loader):
                        if max_steps_per_epoch and bi >= max_steps_per_epoch:
                            break
                        # trigger on the SECOND local step (first is the
                        # compile), not global_step (which starts past the
                        # trigger after a --load resume)
                        if profile_dir and not profile_active and bi == 1:
                            jax.profiler.start_trace(profile_dir)
                            profile_active = True
                            profile_stop_at = bi + profile_steps
                        db = device_batch(batch, task, mesh,
                                          text_encoder,
                                          wire_dtype=wire_dtype)
                        state, stats = train_step(state, db)
                        if profile_active and bi == profile_stop_at:
                            jax.block_until_ready(stats)
                            jax.profiler.stop_trace()
                            profile_active = False
                            profile_dir = None
                        global_step += 1
                        pending.append((global_step, stats))
                        if len(pending) >= log_flush:
                            flush()
                    flush()
                    logging.info(
                        "epoch %d train: loss %.4f (%d steps, %.1fs)",
                        epoch, float(np.mean(losses)) if losses else float("nan"),
                        len(losses), time.time() - t_start,
                    )
                else:
                    means, detailed = run_eval_split(
                        state, eval_step, loader, task, bounds,
                        eval_cutoffs_for(task, False),
                        text_encoder=text_encoder, mesh=mesh,
                        max_batches=max_steps_per_epoch,
                        wire_dtype=wire_dtype,
                    )
                    if len(detailed):
                        detailed["split"] = split
                        detailed["epoch"] = epoch
                        all_detailed.append(detailed)
                    if writers:
                        for k, v in means.items():
                            writers[split].add_scalar(k, v, global_step)
                        for col in detailed.columns:
                            if "iou" in str(col):
                                writers[split].add_scalar(
                                    col, float(detailed[col].mean()), global_step
                                )
                    logging.info("epoch %d %s: %s", epoch, split, means)
            except Exception:
                if profile_active:  # don't leave a trace open for the run
                    jax.profiler.stop_trace()
                    profile_active = False
                    profile_dir = None
                logging.exception("split %s failed; continuing", split)
                continue
        # rank-0-only writes (reference is_main_process() guards,
        # utils.py:547-556): N processes writing latest.ckpt.tmp on a
        # shared filesystem interleave bytes before os.replace
        if jax.process_index() == 0:
            save_checkpoint(
                os.path.join(log_dir, "latest.ckpt"), state, epoch + 1,
            )
            if (epoch + 1) % args.save_freq == 0:
                save_checkpoint(
                    os.path.join(log_dir, f"ckpt_{epoch}.ckpt"), state,
                    epoch + 1,
                )
            if all_detailed:
                with open(detailed_path, "wb") as f:
                    pickle.dump(pd.concat(all_detailed, ignore_index=True), f)
    return state
