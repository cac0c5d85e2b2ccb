"""OVSSC training CLI (reference: train_ovssc.py:172-197).

  python -m semantic_abstraction_tpu.cli.train_ovssc \
      --file_path DATASET_DIR --log LOGDIR [--approach ...]
"""
from __future__ import annotations


def main(argv=None):
    from . import common

    parser = common.config_parser()
    parser.add_argument("--log", type=str, required=True)
    parser.add_argument(
        "--approach",
        choices=["semantic_abstraction", "semantic_aware"],
        default="semantic_abstraction",
    )
    args = parser.parse_args(argv)
    if args.approach == "semantic_aware":
        args.network_inputs = ["rgb"]  # reference train_ovssc.py:185-186
    common.setup_logging()
    common.save_args(args.log, args)

    from ..parallel import make_mesh, maybe_initialize_distributed
    from ..runtime.experiment import setup_experiment, train

    maybe_initialize_distributed()  # multi-host (reference utils.py:131-137)
    mesh = make_mesh(args.num_devices) if args.num_devices != 1 else None
    setup = setup_experiment(args, task="ovssc", approach=args.approach,
                             mesh=mesh)
    if mesh is not None:
        with mesh:
            train(args, setup, mesh=mesh)
    else:
        train(args, setup)


if __name__ == "__main__":
    main()
