"""Evaluation CLI: cutoff-sweep eval over all non-train splits.

Reference: eval.py:16-93. Restores the experiment args.pkl next to the
checkpoint (overriding everything but file_path/load/task), forces
batch 1 / no DR / no balanced sampling, sweeps cutoffs
arange(-2.5, 0, 0.1) — here as ONE vmapped device pass per batch instead
of 25 python passes — and dumps `<ckpt>_eval_stats.pkl`.

  python -m semantic_abstraction_tpu.cli.eval \
      --file_path DATASET_DIR --load CKPT --task ovssc|vool
"""
from __future__ import annotations

import logging
import os


def main(argv=None):
    from . import common

    parser = common.config_parser()
    parser.add_argument("--task", choices=["ovssc", "vool"], required=True)
    parser.add_argument(
        "--approach",
        choices=["semantic_abstraction", "semantic_aware", "clip_spatial"],
        default="semantic_abstraction",
    )
    parser.add_argument("--clip-ckpt", type=str, default=None)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument(
        "--voxel_shapes", type=int, nargs="+", default=None,
        help="cubic voxelization sizes for detailed stats (default 32 64; "
             "NYU tables need 60, reference summarize.py:216)",
    )
    args = parser.parse_args(argv)
    common.setup_logging()
    if not args.load:
        parser.error("--load is required (checkpoint to evaluate)")
    if args.task == "ovssc" and args.approach == "clip_spatial":
        parser.error("clip_spatial is a VOOL-only approach")

    cli_num_workers = args.num_workers
    args_pkl = os.path.join(os.path.dirname(args.load), "args.pkl")
    if os.path.exists(args_pkl):
        saved = common.load_args(args_pkl)
        for k, v in saved.items():
            # keep the eval-invocation flags; restore clip_ckpt from
            # training unless the user passed one (a semantic_aware VOOL
            # eval with random CLIP text features would run to completion
            # and log meaningless metrics)
            if k in ("file_path", "load", "task", "num_devices",
                     "max_batches", "num_workers"):
                continue
            if k == "clip_ckpt" and args.clip_ckpt is not None:
                continue
            setattr(args, k, v)
        args.num_workers = cli_num_workers  # reference re-forces it
        # (reference eval.py:29: num_workers pinned after the restore)
    elif args.approach == "semantic_aware":
        # the train CLIs normalize this before saving args.pkl
        # (train_ovssc.py: semantic_aware -> rgb inputs); without an
        # args.pkl the dataset would emit 1-channel saliency features
        # against a 3-channel rgb model
        args.network_inputs = ["rgb"]
    args.domain_randomization = False
    args.batch_size = 1
    args.balance_spatial_sampling = False
    if (args.task == "vool" and args.approach == "semantic_aware"
            and not args.clip_ckpt):
        logging.warning(
            "semantic_aware VOOL eval without --clip-ckpt: text features "
            "come from a RANDOMLY-initialized CLIP and metrics will be "
            "meaningless"
        )

    from ..parallel import make_mesh, maybe_initialize_distributed
    from ..runtime.experiment import (
        eval_cutoffs_for,
        run_eval_split,
        setup_experiment,
    )
    from ..runtime.train import make_eval_step
    from ..data import DataLoader, ShardedSampler

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    maybe_initialize_distributed()
    # sharded evaluation (reference eval.py:57-59 DistributedSampler): one
    # scene per device on the data mesh; wrap-padded duplicate samples are
    # flagged and NaN'd so sharded stats == single-device stats
    mesh = make_mesh(args.num_devices) if args.num_devices != 1 else None
    setup = setup_experiment(args, task=args.task, approach=args.approach,
                             return_vis=True)
    state = setup["state"]
    compute_dtype = (
        jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    )
    eval_step = make_eval_step(setup["forward_loss"], setup["cfg"],
                               mesh=mesh, compute_dtype=compute_dtype)
    text_encoder = None
    if args.task == "vool" and args.approach == "semantic_aware":
        from .train_vool import make_text_encoder

        text_encoder = make_text_encoder(args)

    bounds = setup["datasets"][next(iter(setup["datasets"]))].cfg.scene_bounds
    cutoffs = eval_cutoffs_for(args.task, detailed=True)
    voxel_shapes = tuple(
        (s, s, s) for s in (args.voxel_shapes or (32, 64))
    )
    n_batch = 1 if mesh is None else int(mesh.devices.size)
    n_proc, proc_id = jax.process_count(), jax.process_index()
    if n_batch < n_proc or n_batch % n_proc:
        raise SystemExit(
            f"multi-process eval needs --num_devices (got mesh of {n_batch}) "
            f"to be a positive multiple of the process count ({n_proc}); "
            "each process must own >= 1 device's batch slot"
        )
    if mesh is not None and n_proc > 1:
        local = [d for d in mesh.devices.flat
                 if d.process_index == proc_id]
        if not local:
            raise SystemExit(
                f"process {proc_id} owns no device of the {n_batch}-device "
                "mesh (make_mesh slices the global device list) — use "
                "--num_devices spanning all hosts or run single-process"
            )
    all_stats = []
    import contextlib

    with (mesh if mesh is not None else contextlib.nullcontext()):
        for split, ds in setup["datasets"].items():
            if split == "train":
                continue
            sampler = ShardedSampler(
                len(ds), num_shards=n_proc, shard_id=proc_id,
                shuffle=False, seed=args.seed,
            )
            loader = DataLoader(
                ds, batch_size=n_batch // n_proc,
                num_workers=args.num_workers, sampler=sampler,
                pad_to_full_batches=mesh is not None,
                pad_static_shapes=mesh is not None,
            )
            means, detailed = run_eval_split(
                state, eval_step, loader, args.task, bounds, cutoffs,
                voxel_shapes=voxel_shapes,
                text_encoder=text_encoder, mesh=mesh,
                max_batches=args.max_batches,
                wire_dtype=(np.float16
                            if getattr(args, "wire_dtype", "float32")
                            == "float16" else None),
            )
            detailed["split"] = split
            detailed["epoch"] = setup["start_epoch"]
            all_stats.append(detailed)
            logging.info("%s: %s", split, means)
            if jax.process_index() == 0:  # reference eval.py:90 rank guard
                stats_path = (os.path.splitext(args.load)[0]
                              + "_eval_stats.pkl")
                tmp = stats_path + ".tmp"
                pd.concat(all_stats, ignore_index=True).to_pickle(tmp)
                os.replace(tmp, stats_path)
                logging.info("dumped stats to %s", stats_path)


if __name__ == "__main__":
    main()
