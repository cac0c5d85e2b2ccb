"""Shared CLI config: the argparse surface of the reference config_parser.

Reference: utils.py:35-113. Same flags, same defaults (typer CLIs in the
reference become argparse subcommands here — typer is not in this image).
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle


def config_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--file_path", type=str, required=True)
    p.add_argument("--voxel_shape", type=int, nargs=3, default=[128, 128, 128])
    p.add_argument("--load", type=str)
    p.add_argument("--batch_size", type=int, default=1,
                   help="PER-DEVICE batch (the reference's batch-1-per-GPU "
                        "regime); global batch = batch_size x mesh devices")
    p.add_argument("--num_warmup_steps", type=int, default=1024)
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=5)
    p.add_argument("--num_devices", type=int, default=None,
                   help="chips in the data mesh (default: all local devices)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--num_descs", type=int, default=4)
    p.add_argument("--saliency_vmin", type=float, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--grad_max_norm", type=float, default=2.0)
    p.add_argument("--xyz_pts_noise", type=float, default=0.0)
    p.add_argument("--num_input_pts", type=int, default=80000)
    p.add_argument("--num_output_pts", type=int, default=400000)
    p.add_argument("--pointing_dim", type=int, default=64)
    p.add_argument("--unet_f_maps", type=int, default=16)
    p.add_argument("--unet_num_channels", type=int, default=16)
    p.add_argument("--unet_num_groups", type=int, default=8)
    p.add_argument("--unet_num_levels", type=int, default=6)
    p.add_argument("--num_patches", type=int, default=4)
    p.add_argument("--patch_mask_cutoff", type=float, default=0.004)
    p.add_argument("--domain_randomization", action="store_true", default=True)
    p.add_argument("--no_domain_randomization", dest="domain_randomization",
                   action="store_false")
    p.add_argument("--use_pts_feat_extractor", action="store_true", default=True)
    p.add_argument("--pts_feat_extractor_hidden_dim", type=int, default=128)
    p.add_argument("--subtract_mean_relevancy", action="store_true", default=True)
    p.add_argument("--offset_patch_mask", action="store_true", default=False)
    p.add_argument("--balance_positive_negative", action="store_true", default=False)
    p.add_argument("--balance_spatial_relations", action="store_true", default=True)
    p.add_argument("--always_replace_subsample_pts", action="store_true",
                   default=False)
    p.add_argument("--balance_spatial_sampling", action="store_true", default=True)
    p.add_argument("--decoder_concat_xyz_pts", action="store_true", default=True)
    p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16",
                   help="device compute dtype (replaces --use_amp)")
    p.add_argument("--wire_dtype", choices=["float32", "float16"],
                   default="float32",
                   help="host->device dtype for coords/relevancy features "
                        "(float16 narrows the ~30 MB/step 128^3 batch for "
                        "bandwidth-limited links; 0/1 labels always ship "
                        "uint8). Default float32 — a real TPU host's PCIe "
                        "does not need it")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--dr_pos", type=float, default=0.1)
    p.add_argument("--dr_orn", type=float, default=0.3)
    p.add_argument("--dr_scale", type=float, default=0.1)
    p.add_argument(
        "--scene_bounds", type=float, nargs=6,
        default=[-1.0, -1.0, -0.1, 1.0, 1.0, 1.9],
    )
    p.add_argument(
        "--pointing_method",
        choices=["cosine_sim", "dot_product", "additive"],
        default="cosine_sim",
    )
    p.add_argument("--saliency_config", choices=["ours", "chefer_et_al"],
                   default="ours")
    p.add_argument(
        "--network_inputs", nargs="+",
        choices=["patch_masks", "saliency", "rgb", "tsdf"],
        default=["saliency"],
    )
    p.add_argument(
        "--lr_scheduler_type",
        choices=["constant", "linear", "cosine", "cosine_with_restarts",
                 "constant_with_warmup"],
        default="cosine_with_restarts",
    )
    p.add_argument("--reduce_method", choices=["max", "mean"], default="max")
    return p


def scene_bounds_pair(args) -> tuple:
    b = args.scene_bounds
    return ((b[0], b[1], b[2]), (b[3], b[4], b[5]))


def save_args(log_dir: str, args) -> None:
    """args.pkl snapshot + diff-on-restart (reference utils.py:145-172)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "args.pkl")
    d = vars(args).copy()
    if os.path.exists(path):
        with open(path, "rb") as fp:
            old = pickle.load(fp)
        diffs = {
            k: (old.get(k), d.get(k))
            for k in set(old) | set(d)
            if old.get(k) != d.get(k) and k not in ("load",)
        }
        if diffs:
            logging.warning("args changed since last run: %s", diffs)
    with open(path, "wb") as fp:
        pickle.dump(d, fp)


def load_args(path: str) -> dict:
    """Load an args.pkl as a dict. The reference pickles the raw
    argparse.Namespace (reference utils.py:160-172), so released-artifact
    args.pkl files arrive as Namespaces — normalize both formats."""
    with open(path, "rb") as fp:
        obj = pickle.load(fp)
    return obj if isinstance(obj, dict) else vars(obj)


def enable_persistent_compile_cache():
    """Point jax at a persistent compile cache so repeated CLI invocations
    skip the remote XLA compiles (20-60 s per program shape through the
    TPU tunnel; a full relevancy sweep recompiling per process is minutes
    of pure overhead). ``SEMABS_JAX_CACHE`` overrides the location;
    ``SEMABS_JAX_CACHE=0`` disables."""
    loc = os.environ.get("SEMABS_JAX_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "semantic_abstraction_tpu", "jax_cache",
        )
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            # respect a cache dir the embedding program already chose
            # (callers of setup_logging get this as a side effect; never
            # clobber an explicit setting)
            return
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        logging.getLogger(__name__).warning(
            "could not enable the persistent compile cache", exc_info=True)


def setup_logging():
    enable_persistent_compile_cache()
    try:
        from rich.logging import RichHandler

        logging.basicConfig(
            level=logging.INFO, format="%(message)s", handlers=[RichHandler()]
        )
    except ImportError:
        logging.basicConfig(level=logging.INFO)
