"""VOOL training CLI (reference: train_vool.py:209-233).

  python -m semantic_abstraction_tpu.cli.train_vool \
      --file_path DATASET_DIR --log LOGDIR [--approach ...]
"""
from __future__ import annotations


def make_text_encoder(args):
    """CLIP text features for SemanticAwareVOOL queries, with caching
    (reference calls ClipWrapper.get_clip_text_feature per batch,
    net.py:594-602)."""
    if args.approach != "semantic_aware":
        return None
    import numpy as np

    from ..clip import VIT_B_32, ClipSaliency, init_clip_params, load_clip_checkpoint

    if args.clip_ckpt:
        params, cfg = load_clip_checkpoint(args.clip_ckpt)
    else:
        import jax

        params, cfg = init_clip_params(jax.random.PRNGKey(0), VIT_B_32), VIT_B_32
    sal = ClipSaliency(params, cfg)
    cache = {}

    def encode(names):
        missing = sorted({n for n in names if n not in cache})
        if missing:
            feats = np.asarray(sal.text_features(missing))
            for n, f in zip(missing, feats):
                cache[n] = f
        return np.stack([cache[n] for n in names])

    return encode


def main(argv=None):
    from . import common

    parser = common.config_parser()
    parser.add_argument("--log", type=str, required=True)
    parser.add_argument(
        "--approach",
        choices=["semantic_abstraction", "semantic_aware", "clip_spatial"],
        default="semantic_abstraction",
    )
    parser.add_argument("--clip-ckpt", type=str, default=None)
    args = parser.parse_args(argv)
    if args.approach == "semantic_aware":
        args.network_inputs = ["rgb"]
    common.setup_logging()
    common.save_args(args.log, args)

    from ..parallel import make_mesh, maybe_initialize_distributed
    from ..runtime.experiment import setup_experiment, train

    maybe_initialize_distributed()  # multi-host (reference utils.py:131-137)
    mesh = make_mesh(args.num_devices) if args.num_devices != 1 else None
    setup = setup_experiment(args, task="vool", approach=args.approach,
                             mesh=mesh)
    text_encoder = make_text_encoder(args)
    if mesh is not None:
        with mesh:
            train(args, setup, mesh=mesh, text_encoder=text_encoder)
    else:
        train(args, setup, text_encoder=text_encoder)


if __name__ == "__main__":
    main()
