"""Relevancy-generation CLI: `image` demo + `dataset` HDF5 writer.

TPU-native re-architecture of the reference CLI (reference:
generate_relevancy.py — ``image`` :394-451, ``dataset`` :149-391,
``generate_saliency_helper`` :63-146). The reference fans a Ray actor
pool of ClipWrapper GPUs over scenes; on TPU the extractor is already
device-batched (tiles x labels x augs in one jitted pipeline), so the
dataset path is a simple sequential sweep with the device saturated per
scene — no actor pool to manage. FileLock still guards HDF5 writes so
multiple hosts can shard scenes.

Usage:
  python -m semantic_abstraction_tpu.cli.generate_relevancy image IMG \
      [--labels ...] [--prompts ...] [--random-weights | --clip-ckpt PATH]
  python -m semantic_abstraction_tpu.cli.generate_relevancy dataset DIR \
      [--num-shards N --shard-id I] [--random-weights | --clip-ckpt PATH]
"""
from __future__ import annotations

import argparse
import functools
import logging
import time
from pathlib import Path

import numpy as np

DEFAULT_LABELS = [
    "basketball jersey",
    "nintendo switch",
    "television",
    "ping pong table",
    "vase",
    "fireplace",
    "abstract painting of a vespa",
    "carpet",
    "wall",
]
DEFAULT_PROMPT = "a photograph of a {} in a home."
# the dataset writer's default for simulator corpora; real-photo sets
# (matterport/nyu in the path) auto-switch to DEFAULT_PROMPT
# (reference generate_relevancy.py:154-158)
THOR_PROMPT = "a render of a {} in a game engine."


@functools.lru_cache(maxsize=16)
def _nearest_exact_device(in_hw, out_hw):
    """Jitted device-side nearest-exact (..., H, W) -> (..., h, w) resize
    with torch F.interpolate(mode="nearest-exact") index semantics — the
    same gather resize_nearest_exact_np performs on host, run BEFORE the
    D2H transfer so the writer reads back store-resolution maps (4x fewer
    bytes at the reference's half-res saliency store)."""
    import jax

    (h, w), (oh, ow) = tuple(in_hw), tuple(out_hw)
    ri = np.minimum(
        ((np.arange(oh) + 0.5) * (h / oh)).astype(np.int64), h - 1)
    ci = np.minimum(
        ((np.arange(ow) + 0.5) * (w / ow)).astype(np.int64), w - 1)
    return jax.jit(lambda m: m[..., ri[:, None], ci[None, :]])


def build_saliency(args):
    import jax.numpy as jnp

    from ..clip import VIT_B_32, ClipSaliency, init_clip_params, load_clip_checkpoint

    if args.clip_ckpt:
        params, cfg = load_clip_checkpoint(args.clip_ckpt)
    else:
        if not args.random_weights:
            raise SystemExit(
                "no --clip-ckpt given; pass --random-weights to run with "
                "randomly initialized CLIP (throughput/debug only)"
            )
        import jax

        cfg = VIT_B_32
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    return ClipSaliency(params, cfg, compute_dtype=dtype,
                        tile_batch_size=args.tile_batch_size,
                        label_bucket=getattr(args, "label_bucket", 0))


def cmd_image(args):
    import imageio.v2 as imageio
    import jax

    from ..clip import saliency_configs

    img = np.asarray(imageio.imread(args.file_path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3]
    assert img.dtype == np.uint8
    sal = build_saliency(args)
    if args.prompt is None:
        args.prompt = DEFAULT_PROMPT  # reference image-command default
    config = saliency_configs[args.saliency_config](img.shape[0])
    start = time.time()
    grads, _ = sal.get_clip_saliency(
        img, args.labels, [args.prompt], config, key=jax.random.PRNGKey(args.seed)
    )
    grads = np.asarray(grads)
    print(f"get gradcam took {time.time() - start} seconds", grads.shape)
    grads = grads - grads.mean(axis=0)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(args.labels)
    rows = int(np.ceil(np.sqrt(n)))
    cols = int(np.ceil(n / rows))
    fig, axes = plt.subplots(rows, cols, squeeze=False)
    axes = axes.flatten()
    vmin, vmax = 0.002, 0.008
    cmap = plt.get_cmap("jet")
    for ax in axes:
        ax.axis("off")
    for ax, label_grad, label in zip(axes, grads, args.labels):
        ax.imshow(img)
        ax.set_title(label, fontsize=10)
        g = np.clip((label_grad - vmin) / (vmax - vmin), 0.0, 1.0)
        colored = cmap(g)
        colored[..., -1] = (1 - g) * 0.7
        ax.imshow(colored)
    plt.tight_layout(pad=0)
    plt.savefig(args.output)
    print(f"dumped relevancy to {args.output}")


def _scene_labels(f, use_gt=True):
    """Assemble the per-scene label set: visible classes + description
    sentences + synonyms + 'mean' (reference generate_relevancy.py:225-346)."""
    from ..data.datasets import SYNONYMS
    from ..data.hdf5 import deref_h5py

    g = f["data"]
    object_labels = np.array(g["objid_to_class"]).astype(str)
    # the visible-only path needs BOTH seg and full_objid_pts — the
    # reference's scene_has_groundtruth gate (generate_relevancy.py:
    # 229-231); a seg-only scene falls back to ALL objid classes
    has_gt = use_gt and "seg" in g and "full_objid_pts" in g
    if has_gt:
        visible = set(
            np.unique(deref_h5py(f["seg"], g["seg"])[0]).astype(int).tolist()
        ) - {-1}
        labels = {
            str(object_labels[objid]) for objid in visible
            if 0 <= objid < len(object_labels)
        }
    else:
        labels = set(object_labels.tolist())
    if "descriptions" in g:
        dg = g["descriptions"]
        t = np.array(dg["target_obj_name"]).astype(str)
        r = np.array(dg["reference_obj_name"]).astype(str)
        rel = np.array(dg["spatial_relation_name"]).astype(str)
        labels.update(t.tolist())
        labels.update(r.tolist())
        for a, b, c in zip(t, rel, r):
            labels.add(f"{a} {b} a {c}")
            # synonym-mapped sentence always added (reference
            # generate_relevancy.py:301-329; identical ones collapse in
            # the set). An earlier guard tested the RELATION against
            # the synonym keys, silently dropping sentences whose only
            # synonym was the reference object — the novel-vocab split
            # would then miss those description saliencies.
            labels.add(f"{SYNONYMS.get(a, a)} {b} a {SYNONYMS.get(c, c)}")
    # reference order over the WHOLE union, names and sentences alike
    # (generate_relevancy.py:330-346): bracket-strip normalize -> add
    # synonyms -> remove the placeholder labels -> one flat sort, so the
    # stored label array is byte-identical for the same scene
    labels = {l.split("[")[0].lstrip().rstrip() for l in labels}
    labels |= {SYNONYMS[l] for l in labels if l in SYNONYMS}
    labels -= {"unlabelled", "empty", "out of bounds"}
    return sorted(labels)


def cmd_dataset(args):
    import h5py
    import jax
    from filelock import FileLock

    from ..clip import saliency_configs
    from ..data.hdf5 import deref_h5py, resize_and_add_data

    sal = build_saliency(args)
    if args.prompt is None:
        # reference generate_relevancy.py:154-158: game-engine prompt for
        # simulator corpora, photo prompt for real-photo sets
        real_photos = ("matterport" in args.file_path
                       or "nyu" in args.file_path)
        args.prompt = DEFAULT_PROMPT if real_photos else THOR_PROMPT
        logging.info("prompt: %r", args.prompt)
    scene_files = sorted(Path(args.file_path).glob("**/*.hdf5"))
    scene_files = scene_files[args.shard_id :: args.num_shards]
    logging.info("processing %d scenes", len(scene_files))
    rgb_keys = ["rgb"] + (
        ["domain_randomized_rgb"] if args.include_domain_randomized else []
    )
    def write_out(job):
        """Realize device results to host + gzip-write the HDF5. The
        np.asarray here is the only sync point; it runs while the NEXT
        scene's extraction is already dispatched on the device (the axon
        readback is ~40% of per-scene wall when serialized)."""
        path, all_labels, results = job
        first_key = results[0][0] if results else None
        for rgb_key, (maps_dev, feats_dev) in results:
            maps = np.asarray(maps_dev, np.float32)
            feats = np.asarray(feats_dev, np.float32)
            mean_map = maps.mean(axis=0, keepdims=True)
            maps = np.concatenate([maps, mean_map], axis=0)
            # mean row = mean of the RAW features; everything normalized
            # at write (reference generate_relevancy.py:108-118)
            feats = np.concatenate([feats, feats.mean(axis=0, keepdims=True)],
                                   axis=0)
            feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
            prefix = f"data/saliencies/{rgb_key}|{args.saliency_config}"
            with FileLock(str(path) + ".lock"):
                with h5py.File(path, "a") as f:
                    # A rewrite appends rows but only replaces the refs, so
                    # old rows leak AND the readers' ABSOLUTE 'mean' row
                    # lookup (a reference quirk both sides reproduce,
                    # dataset.py:824-834) would hit a stale map. When every
                    # existing saliency group belongs to the keys being
                    # rewritten, start the dataset over from row 0; with
                    # foreign groups (another config's refs point into the
                    # rows) fall back to reference append semantics.
                    if (rgb_key == first_key and "saliencies" in f
                            and f["saliencies"].shape[0]):
                        rewriting = {
                            f"{k}|{args.saliency_config}" for k, _ in results
                        }
                        existing = set(f.get("data/saliencies", {}))
                        existing -= {
                            e for e in existing
                            if e.split("|saliency_text_")[0] in rewriting
                        }
                        if not existing:
                            f["saliencies"].resize(
                                (0,) + f["saliencies"].shape[1:]
                            )
                        else:
                            logging.warning(
                                "%s: appending saliency rows after foreign "
                                "groups (%s); the readers' absolute 'mean' "
                                "row will resolve to the FIRST group's map "
                                "(reference quirk)", path.name,
                                sorted(existing)[:3],
                            )
                    # downsample maps for storage parity with the
                    # reference's relevancy_shape (stored at reduced res,
                    # resized back to image shape at read). A scene file
                    # whose schema already fixes the store shape (datagen
                    # preallocates `saliencies`, data/hdf5.py) wins over
                    # --store-shape: appends must match the dataset.
                    store_shape = (
                        tuple(f["saliencies"].shape[1:])
                        if "saliencies" in f
                        else (tuple(args.store_shape) if args.store_shape
                              else None)
                    )
                    if store_shape and maps.shape[1:] != store_shape:
                        # nearest-exact, matching the reference's store-time
                        # interpolate (generate_relevancy.py:96-104); the
                        # READ path upsamples bilinearly on both sides
                        from ..data.transforms import resize_nearest_exact_np

                        maps = resize_nearest_exact_np(
                            maps, store_shape
                        ).astype(np.float32)
                    if prefix in f:
                        del f[prefix]
                    for suffix in ("|saliency_text_labels",
                                   "|saliency_text_label_features"):
                        if prefix + suffix in f:
                            del f[prefix + suffix]
                    if "saliencies" not in f:
                        f.create_dataset(
                            "saliencies", shape=(0,) + maps.shape[1:],
                            maxshape=(None,) + maps.shape[1:],
                            chunks=(1,) + maps.shape[1:],
                            compression="gzip", compression_opts=9, dtype="f",
                        )
                    refs = resize_and_add_data(f["saliencies"], maps)
                    f[prefix] = np.array(refs, dtype=h5py.regionref_dtype)
                    # astype("S") sizes to the longest string like the
                    # reference (:360); a fixed S128 silently truncated
                    # long description sentences, breaking exact-string
                    # row lookups at read time
                    f[prefix + "|saliency_text_labels"] = np.array(
                        all_labels
                    ).astype("S")
                    f[prefix + "|saliency_text_label_features"] = feats

    pending = None  # one-scene-deep software pipeline
    failures = 0
    for si, path in enumerate(scene_files):
        # per-scene failures skip-and-continue: the reference's Ray pool
        # respawns dead ClipWrapper actors and keeps going
        # (generate_relevancy.py:376-390); a corrupt HDF5 or oversized
        # scene must not kill a multi-hour dataset sweep
        try:
            with h5py.File(path, "r") as f:
                # which keys CAN this scene produce? datagen stores a
                # zeros(1) placeholder when no DR frame exists (reference
                # generate_thor_data.py:788,979) — the reference guards
                # with a shape check (generate_relevancy.py:349-352). The
                # done check must cover only producible keys, or
                # placeholder scenes are recomputed on every resume.
                present = []
                for k in rgb_keys:
                    if k == "rgb":
                        present.append(k)
                    elif (k in f["data"]
                          and len(np.array(f["data"][k])[0].shape) > 1):
                        present.append(k)
                done = all(
                    f"data/saliencies/{k}|{args.saliency_config}" in f
                    for k in present
                )
            if done and not args.overwrite:
                continue
            with h5py.File(path, "r") as f:
                labels = _scene_labels(f)
                # the store shape is knowable BEFORE dispatch (the datagen
                # schema preallocates `saliencies`): downsampling to it
                # ON DEVICE cuts the per-scene readback 4x (the reference
                # interpolates on-GPU before moving to host,
                # generate_relevancy.py:96-104)
                scene_store_shape = (
                    tuple(f["saliencies"].shape[1:])
                    if "saliencies" in f
                    else (tuple(args.store_shape) if args.store_shape
                          else None)
                )
                images = {}
                for k in present:
                    if k == "rgb":
                        # deref exactly ONE frame (the reference indexes a
                        # single region ref, :348) — derefing the whole
                        # column gunzips every frame to keep frame 0
                        images[k] = deref_h5py(
                            f["rgb"], f["data/rgb"][:1]
                        )[0].astype(np.uint8)
                    else:
                        images[k] = np.array(f["data"][k][0]).astype(np.uint8)
            if not labels:
                continue
            all_labels = labels + ["mean"]
            results = []
            for rgb_key, img in images.items():
                # the dataset writer sizes crops from the SHORT side
                # (reference generate_relevancy.py:75-80 img_dim=min);
                # only the image demo uses h (reference :429)
                config = saliency_configs[args.saliency_config](
                    min(img.shape[:2])
                )
                # async dispatch: returns device arrays without blocking
                maps_dev, feats_dev = sal.get_clip_saliency(
                    img, labels, [args.prompt], config,
                    key=jax.random.PRNGKey(args.seed + si),
                )
                if (scene_store_shape
                        and tuple(maps_dev.shape[1:]) != scene_store_shape):
                    maps_dev = _nearest_exact_device(
                        tuple(maps_dev.shape[1:]), scene_store_shape
                    )(maps_dev)
                try:
                    # start the D2H immediately so the ~5 MB f16 map
                    # transfer rides under the next scene's device compute
                    # (write_out's np.asarray then just completes it)
                    maps_dev.copy_to_host_async()
                    feats_dev.copy_to_host_async()
                except Exception:
                    pass  # non-PjRt arrays: np.asarray still syncs
                results.append((rgb_key, (maps_dev, feats_dev)))
            if pending is not None:
                job, pending = pending, None
                try:
                    write_out(job)
                except Exception:
                    failures += 1
                    logging.exception("scene %s write failed; continuing",
                                      job[0].name)
            pending = (path, all_labels, results)
            logging.info("[%d/%d] %s: %d labels", si + 1, len(scene_files),
                         path.name, len(all_labels))
        except Exception:
            failures += 1
            logging.exception("scene %s failed; continuing", path.name)
    if pending is not None:
        try:
            write_out(pending)
        except Exception:
            failures += 1
            logging.exception("scene %s failed; continuing", pending[0].name)
    if failures:
        logging.warning("%d scene(s) failed and were skipped", failures)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="generate_relevancy")
    sub = parser.add_subparsers(dest="command", required=True)

    def add_common(p):
        p.add_argument("--clip-ckpt", type=str, default=None)
        p.add_argument("--random-weights", action="store_true")
        p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                       default="bfloat16")
        p.add_argument("--tile_batch_size", type=int, default=32)
        p.add_argument("--saliency_config", choices=["ours", "chefer_et_al"],
                       default="ours")
        p.add_argument(
            "--prompt", type=str, default=None,
            help="CLIP prompt template; dataset default auto-selects "
                 "the game-engine prompt for THOR and the photo prompt "
                 "for matterport/nyu paths (reference :154-158)",
        )
        p.add_argument("--seed", type=int, default=0)

    pi = sub.add_parser("image", help="single-image relevancy demo")
    pi.add_argument("file_path", type=str, nargs="?", default="matterport.png")
    pi.add_argument("--labels", type=str, nargs="+", default=DEFAULT_LABELS)
    pi.add_argument("--output", type=str, default="grads.png")
    add_common(pi)

    pd = sub.add_parser("dataset", help="write relevancies into scene HDF5s")
    pd.add_argument("file_path", type=str)
    pd.add_argument("--num-shards", dest="num_shards", type=int, default=1)
    pd.add_argument("--shard-id", dest="shard_id", type=int, default=0)
    pd.add_argument("--overwrite", action="store_true")
    pd.add_argument("--include-domain-randomized", action="store_true")
    pd.add_argument("--store-shape", type=int, nargs=2, default=None)
    pd.add_argument(
        "--label-bucket", dest="label_bucket", type=int, default=4,
        help="pad each scene's label count up to this multiple so the "
             "jitted extractor compiles once per bucket instead of once "
             "per distinct label count (0 = exact shapes)",
    )
    add_common(pd)

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.command == "image":
        cmd_image(args)
    else:
        cmd_dataset(args)


if __name__ == "__main__":
    main()
