"""Visualization CLI: dense scene inference -> meshes / point clouds.

TPU-native re-architecture of the reference visualize.py (prep_data
:61-154, process_batch_ovssc :157-248, process_batch_vool :354-419,
export_obj :251-280, get_sample_points :283-298).

Key change: the reference re-runs the FULL network (scatter + 3D UNet +
decoder) for every 2^20-point chunk of the 240^3 grid (~13 passes per
class, visualize.py:180-212). Here the feature volume is computed ONCE
per class and only the implicit decoder sweeps the grid, chunked with
``lax.map`` inside one jit — the UNet cost drops from 13x to 1x per
class. Meshes come from the table-free marching-tetrahedra extractor
(open3d turntable rendering is gated: not in this image).

  python -m semantic_abstraction_tpu.cli.visualize ovssc-inference SCENE.pkl \
      --load CKPT [--random-weights | --clip-ckpt PATH]
  python -m semantic_abstraction_tpu.cli.visualize vool-inference SCENE.pkl \
      --load CKPT ...
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle
from pathlib import Path

import numpy as np


def get_sample_points(sampling_shape, scene_bounds) -> np.ndarray:
    """Dense grid of world points (reference visualize.py:283-298)."""
    lc = np.asarray(scene_bounds[0], np.float32)
    uc = np.asarray(scene_bounds[1], np.float32)
    shape = np.asarray(sampling_shape, np.float32)
    axes = [np.arange(s) for s in sampling_shape]
    idxs = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).astype(np.float32)
    pts = idxs * ((uc - lc) / (shape - 1)) + lc
    return pts.reshape(-1, 3)


def export_obj(vol: np.ndarray, filename: str, level: float = 0.5):
    """Volume -> wavefront obj via marching tetrahedra (reference
    visualize.py:251-280: border closed, verts centered/normalized)."""
    from ..ops.fusion import _vertex_normals
    from ..ops.marching import marching_tetrahedra

    vol = vol.copy()
    for axis in range(3):
        sl = [slice(None)] * 3
        for idx in (0, -1):
            sl[axis] = idx
            vol[tuple(sl)] = -np.inf
    if (vol < level).all():
        return False
    # marching_tetrahedra extracts "inside < level"; the reference meshes
    # occupancy (> level) so negate around the level set
    verts, faces = marching_tetrahedra(-vol, level=-level)
    if len(verts) == 0:
        return False
    norms = _vertex_normals(verts, faces)
    shape = np.asarray(vol.shape, np.float32)
    verts = (verts - shape / 2) / shape
    with open(filename, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:f} {v[1]:f} {v[2]:f}\n")
        for n in norms:
            f.write(f"vn {n[0]:f} {n[1]:f} {n[2]:f}\n")
        for face in faces + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")
    return True


def prep_data(args, scene_bounds, approach="semantic_abstraction"):
    """Scene pickle -> relevancies + in-bounds point features
    (reference visualize.py:61-154).

    ``approach`` drives what gets extracted: clip_spatial adds relevancies
    of the full description sentences ("{target} {relation} a {reference}",
    reference net.py:639-678); semantic_aware adds raw CLIP text features
    and the per-point RGB stream instead."""
    import jax

    from .generate_relevancy import build_saliency
    from ..clip import saliency_configs
    from ..data.transforms import depth_to_pointcloud_np, filter_pts_bounds_np

    with open(args.scene_file, "rb") as f:
        data = pickle.load(f)
    rgb = data["rgb"]
    depth = data["depth"].astype(np.float32)
    if "img_shape" in data:  # reference visualize.py:80-82
        import cv2

        rgb = cv2.resize(rgb, data["img_shape"])
        depth = cv2.resize(depth, data["img_shape"])
    cam_intr = data["cam_intr"]
    cam_extr = data["cam_extr"]
    descriptions = data.get("descriptions", [])
    ovssc_obj_classes = data.get("ovssc_obj_classes", [])
    target_classes = [d[0] for d in descriptions]
    relation_names = [d[1] for d in descriptions]
    reference_classes = [d[2] for d in descriptions]
    relevancy_keys = sorted(
        set(ovssc_obj_classes) | set(target_classes) | set(reference_classes)
    )
    if approach == "clip_spatial":
        relevancy_keys = sorted(
            set(relevancy_keys)
            | {f"{t} {r} a {f_}" for t, r, f_ in descriptions}
        )

    sal = build_saliency(args)
    xyz = depth_to_pointcloud_np(depth, cam_intr, cam_extr)
    in_bounds = filter_pts_bounds_np(xyz, np.asarray(scene_bounds))
    xyz = xyz[in_bounds]
    if approach == "semantic_aware":
        # semantic_aware consumes RGB points + text features only — the
        # per-label gradcam sweep (the most expensive stage) would be
        # discarded, so skip it entirely
        flat = {}
    else:
        config = saliency_configs[args.saliency_config](rgb.shape[0])
        maps, _ = sal.get_clip_saliency(
            rgb, relevancy_keys, ["a photograph of a {} in a home."], config,
            key=jax.random.PRNGKey(args.seed),
        )
        maps = np.asarray(maps) * 50.0
        if args.subtract_mean:
            maps = maps - maps.mean(axis=0, keepdims=True)
        flat = {
            k: maps[i].reshape(-1)[in_bounds]
            for i, k in enumerate(relevancy_keys)
        }
    out = {
        "rgb": rgb,
        "depth": depth,
        "cam_intr": cam_intr,
        "cam_extr": cam_extr,
        "input_xyz_pts": xyz,
        "input_rgb_pts": rgb.reshape(-1, 3)[in_bounds],
        "relevancy": flat,
        "ovssc_obj_classes": ovssc_obj_classes,
        "descriptions": descriptions,
        "target_classes": target_classes,
        "relation_names": relation_names,
        "reference_classes": reference_classes,
        "scene_id": Path(args.scene_file).stem,
    }
    if approach == "semantic_aware":
        names = sorted(set(ovssc_obj_classes) | set(target_classes)
                       | set(reference_classes))
        # VOOL's text encoder is RAW encode_text (reference
        # ClipWrapper.get_clip_text_feature; train_vool.make_text_encoder)
        feats = np.asarray(sal.text_features(names)) if names else np.zeros(
            (0, 512), np.float32
        )
        out["text_features"] = {n: feats[i] for i, n in enumerate(names)}
        # ... but OVSSC semantic_aware checkpoints were TRAINED on the
        # dataset's stored |saliency_text_label_features — the NORMALIZED
        # prompt-ensembled zeroshot features (datasets.py; the writer's
        # per-corpus prompt: game-engine for THOR scenes, photo for
        # matterport/nyu) — so the pointer must see the same kind here
        from .generate_relevancy import DEFAULT_PROMPT, THOR_PROMPT

        low = str(args.scene_file).lower()
        prompt = (DEFAULT_PROMPT if ("matterport" in low or "nyu" in low)
                  else THOR_PROMPT)
        zw = (np.asarray(sal.zeroshot_weights(names, [prompt])).T
              if names else np.zeros((0, 512), np.float32))
        out["class_features"] = {n: zw[i] for i, n in enumerate(names)}
    return out


def _restore_net(args, task):
    """Rebuild the trained net's EXACT config + approach from the
    checkpoint's args.pkl (reference visualize.py:310-315) and load the
    params. Without args.pkl falls back to the CLI flags/defaults."""
    import jax

    from . import common
    from ..runtime.experiment import APPROACHES, model_cfg_from_args
    from ..runtime.train import init_train_state, make_optimizer

    approach = args.approach
    ns = None
    if args.load:
        args_pkl = os.path.join(os.path.dirname(args.load), "args.pkl")
        if os.path.exists(args_pkl):
            saved = common.load_args(args_pkl)
            ns = argparse.Namespace(**saved)
            approach = saved.get("approach", approach)
            logging.info("restored net config from %s (approach=%s)",
                         args_pkl, approach)
    if ns is None:
        defaults = dict(
            voxel_shape=args.voxel_shape,
            scene_bounds=[-1.0, -1.0, -0.1, 1.0, 1.0, 1.9],
            unet_num_channels=16, unet_f_maps=16, unet_num_groups=8,
            unet_num_levels=6,
            network_inputs=(["rgb"] if approach == "semantic_aware"
                            else ["saliency"]),
            use_pts_feat_extractor=True, pts_feat_extractor_hidden_dim=128,
            reduce_method="max", decoder_concat_xyz_pts=True,
            pointing_method="cosine_sim", pointing_dim=64,
        )
        ns = argparse.Namespace(**defaults)
    cfg = model_cfg_from_args(task, approach, ns)
    init_fn = APPROACHES[(task, approach)][1]
    params = init_fn(jax.random.PRNGKey(0), cfg)
    if args.load:
        # handles both our flax checkpoints and reference .pth directly
        from ..runtime.checkpoint import load_net_checkpoint

        state = init_train_state(params, make_optimizer())
        state, _ = load_net_checkpoint(args.load, state, task, approach)
        params = state.params
    else:
        logging.warning("no --load checkpoint: using random weights")
    return cfg, params, approach


def _upload_chunks(pts, chunk=2**18):
    """Pad a dense point grid to chunk multiples and upload it ONCE —
    the ~166 MB 240^3 grid must not re-cross the tunnel per class."""
    import jax.numpy as jnp

    n = len(pts)
    pad = (-n) % chunk
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)], axis=0)
    return jnp.asarray(pts_p.reshape(-1, chunk, 3)), n


def make_dense_decoder(grid, dhw, concat_xyz, post=None):
    """ONE jitted implicit-decoder sweep reused across classes/descriptions.

    The channel-last feature volume is neighborhood-PACKED once per call
    and every chunk samples the shared pack (the per-chunk pack rebuild
    was ~50 passes over a 0.5 GB temp at the 240^3 sweep). ``post`` maps
    each chunk's decoded (chunk, output_dim) features to per-point outputs
    INSIDE the jit (e.g. a class-feature pointer) and receives the
    per-class vector as the traced ``post_arg`` — defining a fresh closure
    (and hence a fresh jit cache entry: retrace + recompile + grid
    re-upload) per class was N-1 wasted compiles. Default takes channel 0.
    """
    import jax
    import jax.numpy as jnp

    from ..models.decoder import _linear
    from ..ops.sampling import grid_sample_packed, pack_volume

    @jax.jit
    def run(decoder_params, vol_, chunks_, post_arg):
        pack = pack_volume(vol_[0])

        def body(c):
            idx_f = grid.points_to_idxs(c, cast_to_int=False)
            shape = jnp.asarray(grid.grid_shape, dtype=idx_f.dtype)
            coords = 2.0 * (idx_f / shape) - 1.0
            sampled = grid_sample_packed(pack, dhw, coords)
            if concat_xyz:
                sampled = jnp.concatenate(
                    [sampled, coords.astype(sampled.dtype)], axis=-1)
            h = jax.nn.leaky_relu(
                _linear(decoder_params["fc1"], sampled), negative_slope=0.01)
            feats = _linear(decoder_params["fc2"], h)
            return post(feats, post_arg) if post is not None else feats[:, 0]

        return jax.lax.map(body, chunks_)

    return run


class DenseArgmax:
    """Device-resident running (argmax, max) over per-class dense sweeps.

    The 240^3 sweep's bottleneck through the axon tunnel is READBACK:
    ~55 MB of f32 logits per class at ~25 MB/s. Keeping a running
    (best_idx uint8, best_val) pair on device and reading back once makes
    the transfer ~28 MB total, independent of the class count."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self._best = None

        @jax.jit
        def upd(bv, bi, out, ci):
            out = out.reshape(-1)
            better = out > bv
            return (
                jnp.where(better, out, bv),
                jnp.where(better, jnp.uint8(ci), bi),
            )

        @jax.jit
        def init(out):
            out = out.reshape(-1)
            return out, jnp.zeros(out.shape, jnp.uint8)

        self._upd, self._init = upd, init

    def update(self, out_dev, class_idx):
        if self._best is None:
            self._best = self._init(out_dev)
        else:
            self._best = self._upd(*self._best, out_dev, class_idx)

    def finalize(self, n, cutoff):
        """-> (prediction uint8 (n,), empty bool (n,)) on host."""
        import jax
        import jax.numpy as jnp

        bv, bi = self._best
        empty = jax.jit(lambda v: v < cutoff)(bv)
        return np.asarray(bi)[:n], np.asarray(empty)[:n]


def cmd_ovssc(args):
    import jax.numpy as jnp

    from ..data.transforms import check_pts_in_frustum_np
    from ..models import semabs3d_feature_vol
    from ..models.decoder import pointing_attention_paired
    from ..ops.fusion import TSDFVolume

    cfg, params, approach = _restore_net(args, "ovssc")
    # scene bounds come from the restored net config (the reference copies
    # every args.pkl field, visualize.py:310-315) — a checkpoint trained
    # with non-default bounds must voxelize/sample the same region here
    ccfg0 = getattr(cfg, "completion", cfg)
    scene_bounds = tuple(map(tuple, ccfg0.scene_bounds))
    shape = tuple(args.sampling_shape)
    vs_axes = [(scene_bounds[1][a] - scene_bounds[0][a]) / shape[a]
               for a in range(3)]
    if max(vs_axes) - min(vs_axes) > 1e-9:
        raise SystemExit(
            f"--sampling_shape {shape} gives non-uniform voxel sizes "
            f"{vs_axes} over bounds {scene_bounds}; the TSDF carving mask "
            "needs one voxel size — pick a shape proportional to the bounds"
        )
    batch = prep_data(args, scene_bounds, approach)
    if not batch["ovssc_obj_classes"]:
        raise SystemExit(
            f"{args.scene_file} carries no ovssc_obj_classes — nothing to "
            "complete (use vool-inference for description scenes)"
        )
    grid_points = get_sample_points(shape, scene_bounds)
    rs = np.random.RandomState(args.seed)
    dump = Path(args.dump_path) / batch["scene_id"]
    dump.mkdir(parents=True, exist_ok=True)
    cd = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    # running (argmax, max) accumulated ON DEVICE: per-class logit volumes
    # are never read back (55 MB/class over the tunnel); only the final
    # uint8 prediction + empty mask transfer (~28 MB total)
    acc = DenseArgmax()
    chunks, n_pts = _upload_chunks(grid_points)
    if approach == "semantic_aware":
        # one RGB feature volume shared by all classes; the CLIP-dim
        # decode is pointed at each class text feature INSIDE the sweep
        ccfg, cparams = cfg.completion, params["completion"]
        idx = rs.choice(len(batch["input_xyz_pts"]), size=args.num_input_pts)
        xyz = jnp.asarray(batch["input_xyz_pts"][idx])[None]
        rgb_feats = jnp.asarray(
            batch["input_rgb_pts"][idx].astype(np.float32) / 255.0
        )[None, None]
        vol = semabs3d_feature_vol(cparams, ccfg, xyz, rgb_feats,
                                   compute_dtype=cd)

        def point_at_class(feats, cf):
            return pointing_attention_paired(
                params["pointer"], key=cf, query=feats,
                method=cfg.pointing_method,
                pointing_dim=cfg.clip_hidden_dim,
                temperature=cfg.pointing_temperature,
            )

        decode = make_dense_decoder(ccfg.grid, vol.shape[1:4],
                                    ccfg.decoder_concat_xyz_pts,
                                    post=point_at_class)
        for ci, obj_class in enumerate(batch["ovssc_obj_classes"]):
            cf = jnp.asarray(batch["class_features"][obj_class])
            acc.update(decode(cparams["decoder"], vol, chunks, cf), ci)
            logging.info("completed %s", obj_class)
    else:
        decode = None
        for ci, obj_class in enumerate(batch["ovssc_obj_classes"]):
            idx = rs.choice(len(batch["input_xyz_pts"]), size=args.num_input_pts)
            xyz = jnp.asarray(batch["input_xyz_pts"][idx])[None]
            feats = jnp.asarray(
                batch["relevancy"][obj_class][idx].astype(np.float32)
            )[None, None, :, None]
            vol = semabs3d_feature_vol(params, cfg, xyz, feats,
                                       compute_dtype=cd)
            if decode is None:
                decode = make_dense_decoder(cfg.grid, vol.shape[1:4],
                                            cfg.decoder_concat_xyz_pts)
            acc.update(
                decode(params["decoder"], vol, chunks, jnp.zeros(())), ci
            )
            logging.info("completed %s", obj_class)
    prediction_flat, empty_flat = acc.finalize(n_pts, args.cutoff)
    prediction = prediction_flat.reshape(shape)
    empty = empty_flat.reshape(shape)

    tsdf = TSDFVolume(
        np.asarray(scene_bounds).T,
        voxel_size=vs_axes[0],
    )
    tsdf.integrate(batch["rgb"], batch["depth"], batch["cam_intr"],
                   batch["cam_extr"])
    tsdf_vol = tsdf.get_volume()[0]
    in_frustum = check_pts_in_frustum_np(
        grid_points, batch["depth"].shape, batch["cam_extr"], batch["cam_intr"]
    ).reshape(shape)
    for ci, label in enumerate(batch["ovssc_obj_classes"]):
        vol = (prediction == ci).astype(np.float32)
        vol[empty] = 0.0
        vol[~in_frustum] = 0.0
        vol[tsdf_vol > 0.0] = 0.0
        path = str(dump / f"{label.replace(' ', '_')}.obj")
        if export_obj(vol, path):
            logging.info("wrote %s", path)
    logging.info("done -> %s", dump)


def cmd_vool(args):
    import jax
    import jax.numpy as jnp

    from ..models import semabs3d_feature_vol
    from ..models.decoder import (
        _linear,
        implicit_decoder,
        pointing_attention,
        pointing_attention_paired,
    )
    from ..models.nets import RELATION_TO_ID
    from ..ops.fusion import pcwrite

    cfg, params, approach = _restore_net(args, "vool")
    ccfg = cfg.completion
    cparams = params["completion"]
    # bounds from the restored net config (see cmd_ovssc)
    scene_bounds = tuple(map(tuple, ccfg.scene_bounds))
    batch = prep_data(args, scene_bounds, approach)
    shape = tuple(args.sampling_shape)
    grid_points = get_sample_points(shape, scene_bounds).astype(np.float32)
    rs = np.random.RandomState(args.seed)
    dump = Path(args.dump_path) / batch["scene_id"]
    dump.mkdir(parents=True, exist_ok=True)
    cd = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    chunks, n_pts = _upload_chunks(grid_points)

    def make_logit_decoder(sampler_params, with_query):
        """ONE jitted spatial-sampler sweep per (params, query-mode),
        reused across descriptions; with ``with_query`` the per-point
        features are pointed at the traced query vector inside the body
        (a fresh closure per description meant a recompile each)."""

        @jax.jit
        def run(fvol_, chunks_, query):
            def body(c):
                sampled = implicit_decoder(
                    sampler_params, fvol_, ccfg.grid, c[None],
                    getattr(cfg, "decoder_concat_xyz_pts",
                            ccfg.decoder_concat_xyz_pts),
                    channels_last=True,
                )
                if not with_query:
                    return sampled[0, :, 0]
                return pointing_attention(
                    params["pointer"], sampled, query[None, None],
                    cfg.pointing_method, cfg.pointing_dim,
                    cfg.pointing_temperature,
                )[0, :, 0]

            return jax.lax.map(body, chunks_)

        return run

    logit_decoders = {}

    def decode_logits(fvol, sampler_params, pointer_query=None):
        key = (id(sampler_params), pointer_query is not None)
        if key not in logit_decoders:
            logit_decoders[key] = make_logit_decoder(
                sampler_params, pointer_query is not None
            )
        q = (jnp.zeros(()) if pointer_query is None
             else jnp.asarray(pointer_query))
        out = logit_decoders[key](fvol, chunks, q)
        return np.asarray(out).reshape(-1)[:n_pts]

    sa_decode = None
    for (target, relation, reference) in batch["descriptions"]:
        idx = rs.choice(len(batch["input_xyz_pts"]), size=args.num_input_pts)
        xyz = jnp.asarray(batch["input_xyz_pts"][idx])[None]
        if approach == "semantic_aware":
            # RGB completion decoded to pointing features; query =
            # mlp(cat(CLIP(target), CLIP(reference), relation emb))
            # (reference net.py:582-636)
            rgb = jnp.asarray(
                batch["input_rgb_pts"][idx].astype(np.float32) / 255.0
            )[None, None]
            vol = semabs3d_feature_vol(cparams, ccfg, xyz, rgb,
                                       compute_dtype=cd)
            rel_emb = params["relation_embeddings"][RELATION_TO_ID[relation]]
            query = _linear(
                params["query_mlp"],
                jnp.concatenate([
                    jnp.asarray(batch["text_features"][target]),
                    jnp.asarray(batch["text_features"][reference]),
                    rel_emb,
                ]),
            )
            if sa_decode is None:
                def point_at_query(feats, q):
                    return pointing_attention_paired(
                        params["pointer"], key=q, query=feats,
                        method=cfg.pointing_method,
                        pointing_dim=cfg.pointing_dim,
                        temperature=cfg.pointing_temperature,
                    )

                sa_decode = make_dense_decoder(
                    ccfg.grid, vol.shape[1:4],
                    ccfg.decoder_concat_xyz_pts, post=point_at_query,
                )
            out = sa_decode(cparams["decoder"], vol, chunks, query)
            logits = np.asarray(out).reshape(-1)[:n_pts]
        elif approach == "clip_spatial":
            # single completion pass on the FULL-description relevancy
            # (reference net.py:639-678)
            desc_key = f"{target} {relation} a {reference}"
            sal = jnp.asarray(
                batch["relevancy"][desc_key][idx].astype(np.float32)
            )[None, None, :, None]
            fvol = semabs3d_feature_vol(cparams, ccfg, xyz, sal,
                                        compute_dtype=cd)
            logits = decode_logits(fvol, params["spatial_sampler"])
        else:
            tgt = jnp.asarray(
                batch["relevancy"][target][idx].astype(np.float32)
            )[None, None, :, None]
            ref = jnp.asarray(
                batch["relevancy"][reference][idx].astype(np.float32)
            )[None, None, :, None]
            tvol = semabs3d_feature_vol(cparams, ccfg, xyz, tgt,
                                        compute_dtype=cd)
            rvol = semabs3d_feature_vol(cparams, ccfg, xyz, ref,
                                        compute_dtype=cd)
            fvol = jnp.concatenate([tvol, rvol], axis=-1)
            rel_emb = params["relation_embeddings"][RELATION_TO_ID[relation]]
            logits = decode_logits(fvol, params["spatial_sampler"], rel_emb)
        top = logits.max()
        mask = logits > (top - args.vool_band)
        pts = grid_points[mask]
        # reference exponentiates the kept logprobs BEFORE min-max
        # normalization (visualize.py:468-472) — exp is monotone but
        # nonlinear over the band, so the jet colors differ otherwise
        probs = np.exp(logits[mask])
        heat = (probs - probs.min()) / max(1e-9, probs.max() - probs.min())
        try:
            import matplotlib.cm as cm

            colors = (cm.jet(heat)[:, :3] * 255).astype(np.uint8)
        except ImportError:
            colors = np.tile((heat[:, None] * 255).astype(np.uint8), (1, 3))
        desc = f"{target}_{relation}_{reference}".replace(" ", "_")
        path = str(dump / f"{desc}.ply")
        pcwrite(path, np.hstack([pts, colors.astype(np.float32)]))
        logging.info("wrote %s (%d pts)", path, len(pts))
    # scene point cloud for the turntable render (reference
    # visualize.py:472-487 dumps scene_rgb.ply alongside the localizations)
    n_scene = min(100000, len(batch["input_xyz_pts"]))
    sidx = (np.arange(len(batch["input_xyz_pts"])) if n_scene == len(
        batch["input_xyz_pts"]
    ) else rs.choice(len(batch["input_xyz_pts"]), size=n_scene, replace=False))
    pcwrite(
        str(dump / "scene_rgb.ply"),
        np.hstack([
            batch["input_xyz_pts"][sidx],
            batch["input_rgb_pts"][sidx].astype(np.float32),
        ]),
    )
    logging.info("done -> %s", dump)


# ---------------------------------------------------------------------------
# Turntable rendering (reference visualize.py:521-605). open3d/ffmpeg are not
# in this image; the renderer is a matplotlib 3D scatter turntable written
# with imageio — mp4 when an ffmpeg backend exists, .gif otherwise.
# ---------------------------------------------------------------------------

# sashamaps.net/docs/resources/20-colors (public palette, as vendored by the
# reference visualize.py:489-518)
TWENTY_COLORS = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
    [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
    [128, 128, 0], [255, 215, 180], [0, 0, 128], [128, 128, 128],
]) / 255.0


def load_obj_vertices(path: str) -> np.ndarray:
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(verts, np.float32)


def load_ply_points(path: str):
    """Read the ascii PLY written by ops.fusion.pcwrite -> (pts, colors)."""
    with open(path) as f:
        n = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        rows = [f.readline().split() for _ in range(n)]
    arr = np.asarray(rows, np.float32)
    pts = arr[:, :3]
    colors = arr[:, 3:6] / 255.0 if arr.shape[1] >= 6 else None
    return pts, colors


def _upright(pts: np.ndarray) -> np.ndarray:
    """euler2mat(-pi/2, 0, 0) like the reference: z-up for the turntable."""
    return np.stack([pts[:, 0], pts[:, 2], -pts[:, 1]], axis=1)


def render_turntable(geometries, n_frames=72, size=640, point_size=2.0,
                     legend=None):
    """geometries: [(pts, colors 0..1 | None)] -> list of RGB frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(size / 100, size / 100), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    allpts = []
    for pts, colors in geometries:
        if len(pts) > 60000:
            sel = np.random.RandomState(0).choice(len(pts), 60000, replace=False)
            pts = pts[sel]
            colors = colors[sel] if colors is not None else None
        pts = _upright(pts)
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=point_size,
                   c=colors if colors is not None else "gray",
                   depthshade=False, linewidths=0)
        allpts.append(pts)
    allpts = np.concatenate(allpts) if allpts else np.zeros((1, 3))
    center = (allpts.min(0) + allpts.max(0)) / 2
    radius = max(1e-6, (allpts.max(0) - allpts.min(0)).max() / 2)
    for dim, c in zip("xyz", center):
        getattr(ax, f"set_{dim}lim")(c - radius, c + radius)
    ax.set_axis_off()
    if legend:
        handles = [
            plt.Line2D([], [], marker="s", color=c, ls="none", label=l)
            for l, c in legend.items()
        ]
        ax.legend(handles=handles, loc="lower left", framealpha=0,
                  fontsize=7)
    frames = []
    for i in range(n_frames):
        ax.view_init(elev=25, azim=360.0 * i / n_frames)
        fig.canvas.draw()
        frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
    plt.close(fig)
    return frames


def write_video(frames, out_base: str, fps: int = 24) -> str:
    """mp4 via imageio/ffmpeg when available, else an animated gif."""
    import imageio

    try:
        with imageio.get_writer(out_base + ".mp4", fps=fps) as w:
            for f in frames:
                w.append_data(f)
        return out_base + ".mp4"
    except Exception:
        imageio.mimsave(out_base + ".gif", frames, duration=1000 // fps,
                        loop=0)
        return out_base + ".gif"


def cmd_ovssc_visualize(args):
    """Per-class completion meshes -> one turntable video
    (reference ovssc_visualize, visualize.py:557-583)."""
    geoms, legend = [], {}
    paths = sorted(Path(args.output_path).rglob("*.obj"))
    for idx, path in enumerate(paths):
        verts = load_obj_vertices(str(path))
        if not len(verts):
            continue
        color = TWENTY_COLORS[idx % 20]
        geoms.append((verts, np.tile(color, (len(verts), 1))))
        legend[path.stem] = tuple(color)
    if not geoms:
        logging.warning("no .obj meshes under %s", args.output_path)
        return
    frames = render_turntable(geoms, n_frames=args.n_frames, legend=legend,
                              point_size=4.0)
    out = write_video(frames, str(Path(args.output_path) / "completion"))
    logging.info("wrote %s", out)


def cmd_vool_visualize(args):
    """Scene cloud + per-description localization -> one video each
    (reference vool_visualize, visualize.py:585-605)."""
    plys = {p.stem: p for p in sorted(Path(args.output_path).rglob("*.ply"))}
    scene = plys.pop("scene_rgb", None)
    scene_geom = None
    if scene is not None:
        pts, colors = load_ply_points(str(scene))
        scene_geom = (pts, colors)
    for desc, path in plys.items():
        pts, colors = load_ply_points(str(path))
        geoms = ([scene_geom] if scene_geom else []) + [(pts, colors)]
        frames = render_turntable(geoms, n_frames=args.n_frames)
        out = write_video(frames, str(path.parent / desc))
        logging.info("wrote %s", out)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="visualize")
    sub = parser.add_subparsers(dest="command", required=True)

    def add_common(p):
        p.add_argument("scene_file", type=str)
        p.add_argument("--load", type=str, default=None)
        p.add_argument("--dump-path", type=str, default="visualizations")
        p.add_argument("--voxel_shape", type=int, nargs=3,
                       default=[128, 128, 128])
        p.add_argument("--sampling_shape", type=int, nargs=3,
                       default=[240, 240, 240])
        p.add_argument("--num_input_pts", type=int, default=80000)
        p.add_argument("--cutoff", type=float, default=-3.0)
        p.add_argument("--vool-band", type=float, default=0.15)
        p.add_argument("--subtract-mean", action="store_true", default=True)
        p.add_argument("--clip-ckpt", type=str, default=None)
        p.add_argument("--random-weights", action="store_true")
        p.add_argument("--compute_dtype", choices=["bfloat16", "float32"],
                       default="bfloat16")
        p.add_argument("--tile_batch_size", type=int, default=32)
        p.add_argument("--saliency_config", choices=["ours", "chefer_et_al"],
                       default="ours")
        p.add_argument("--seed", type=int, default=0)
        p.add_argument(
            "--approach",
            choices=["semantic_abstraction", "semantic_aware", "clip_spatial"],
            default="semantic_abstraction",
            help="overridden by the checkpoint's args.pkl when present",
        )

    po = sub.add_parser("ovssc-inference")
    add_common(po)
    pv = sub.add_parser("vool-inference")
    add_common(pv)

    def add_render(p):
        p.add_argument("output_path", type=str,
                       help="inference dump dir (the <dump-path>/<scene_id>)")
        p.add_argument("--n_frames", type=int, default=72)

    pov = sub.add_parser("ovssc-visualize")
    add_render(pov)
    pvv = sub.add_parser("vool-visualize")
    add_render(pvv)

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.command == "ovssc-inference":
        cmd_ovssc(args)
    elif args.command == "vool-inference":
        cmd_vool(args)
    elif args.command == "ovssc-visualize":
        cmd_ovssc_visualize(args)
    else:
        cmd_vool_visualize(args)


if __name__ == "__main__":
    main()
