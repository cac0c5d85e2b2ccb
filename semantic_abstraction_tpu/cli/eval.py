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
import pickle


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

    args_pkl = os.path.join(os.path.dirname(args.load), "args.pkl")
    if os.path.exists(args_pkl):
        saved = common.load_args(args_pkl)
        for k, v in saved.items():
            if k in ("file_path", "load", "task", "num_devices", "max_batches",
                     "clip_ckpt"):
                continue
            setattr(args, k, v)
    args.domain_randomization = False
    args.batch_size = 1
    args.balance_spatial_sampling = False

    import numpy as np

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
    cutoffs = tuple(float(c) for c in np.arange(-2.5, 0, 0.1))
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
            )
            detailed["split"] = split
            detailed["epoch"] = setup["start_epoch"]
            all_stats.append(detailed)
            logging.info("%s: %s", split, means)
            stats_path = os.path.splitext(args.load)[0] + "_eval_stats.pkl"
            pd.concat(all_stats, ignore_index=True).to_pickle(stats_path)
            logging.info("dumped stats to %s", stats_path)


if __name__ == "__main__":
    main()
