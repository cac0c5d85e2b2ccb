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


def prep_data(args, scene_bounds):
    """Scene pickle -> relevancies + in-bounds point features
    (reference visualize.py:61-154)."""
    import jax

    from .generate_relevancy import build_saliency
    from ..clip import saliency_configs
    from ..data.transforms import depth_to_pointcloud_np, filter_pts_bounds_np

    with open(args.scene_file, "rb") as f:
        data = pickle.load(f)
    rgb = data["rgb"]
    depth = data["depth"].astype(np.float32)
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

    sal = build_saliency(args)
    config = saliency_configs[args.saliency_config](rgb.shape[0])
    maps, _ = sal.get_clip_saliency(
        rgb, relevancy_keys, ["a photograph of a {} in a home."], config,
        key=jax.random.PRNGKey(args.seed),
    )
    maps = np.asarray(maps) * 50.0
    if args.subtract_mean:
        maps = maps - maps.mean(axis=0, keepdims=True)

    xyz = depth_to_pointcloud_np(depth, cam_intr, cam_extr)
    in_bounds = filter_pts_bounds_np(xyz, np.asarray(scene_bounds))
    xyz = xyz[in_bounds]
    flat = {k: maps[i].reshape(-1)[in_bounds] for i, k in enumerate(relevancy_keys)}
    return {
        "rgb": rgb,
        "depth": depth,
        "cam_intr": cam_intr,
        "cam_extr": cam_extr,
        "input_xyz_pts": xyz,
        "relevancy": flat,
        "ovssc_obj_classes": ovssc_obj_classes,
        "descriptions": descriptions,
        "target_classes": target_classes,
        "relation_names": relation_names,
        "reference_classes": reference_classes,
        "scene_id": Path(args.scene_file).stem,
    }


def _load_state_params(args, cfg_builder):
    import jax

    from ..runtime.checkpoint import load_checkpoint
    from ..runtime.train import init_train_state, make_optimizer

    cfg, init_fn = cfg_builder()
    params = init_fn(jax.random.PRNGKey(0), cfg)
    if args.load:
        tx = make_optimizer()
        state = init_train_state(params, tx)
        state, _, _ = load_checkpoint(args.load, state)
        params = state.params
    else:
        logging.warning("no --load checkpoint: using random weights")
    return cfg, params


def _dense_decode(decoder_params, vol, grid, pts, concat_xyz, chunk=2**18):
    """Implicit-decoder sweep over a dense point grid, lax.map-chunked.

    The channel-last feature volume is neighborhood-PACKED once and every
    chunk samples the shared pack (the per-chunk pack rebuild was ~50
    passes over a 0.5 GB temp at the 240^3 sweep)."""
    import jax
    import jax.numpy as jnp

    from ..models.decoder import _linear
    from ..ops.sampling import grid_sample_packed, pack_volume

    n = len(pts)
    pad = (-n) % chunk
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)], axis=0)
    chunks = jnp.asarray(pts_p.reshape(-1, chunk, 3))
    dhw = vol.shape[1:4]

    @jax.jit
    def run(vol_, chunks_):
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
            return _linear(decoder_params["fc2"], h)[:, 0]

        return jax.lax.map(body, chunks_)

    out = np.asarray(run(vol, chunks)).reshape(-1)
    return out[:n]


def cmd_ovssc(args):
    import jax.numpy as jnp

    from ..data.transforms import check_pts_in_frustum_np
    from ..models import SemAbs3DConfig, init_semabs3d, semabs3d_feature_vol
    from ..ops.fusion import TSDFVolume

    scene_bounds = ((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9))
    batch = prep_data(args, scene_bounds)
    shape = tuple(args.sampling_shape)

    def build():
        cfg = SemAbs3DConfig(voxel_shape=tuple(args.voxel_shape))
        return cfg, init_semabs3d

    cfg, params = _load_state_params(args, build)
    grid_points = get_sample_points(shape, scene_bounds)
    rs = np.random.RandomState(args.seed)
    dump = Path(args.dump_path) / batch["scene_id"]
    dump.mkdir(parents=True, exist_ok=True)

    logprobs = []
    for obj_class in batch["ovssc_obj_classes"]:
        idx = rs.choice(len(batch["input_xyz_pts"]), size=args.num_input_pts)
        xyz = jnp.asarray(batch["input_xyz_pts"][idx])[None]
        feats = jnp.asarray(
            batch["relevancy"][obj_class][idx].astype(np.float32)
        )[None, None, :, None]
        vol = semabs3d_feature_vol(params, cfg, xyz, feats,
                                   compute_dtype=jnp.bfloat16)
        out = _dense_decode(
            params["decoder"], vol, cfg.grid, grid_points,
            cfg.decoder_concat_xyz_pts,
        )
        logprobs.append(out.reshape(shape))
        logging.info("completed %s", obj_class)
    logprobs = np.stack(logprobs, axis=-1)

    tsdf = TSDFVolume(
        np.asarray(scene_bounds).T,
        voxel_size=(scene_bounds[1][0] - scene_bounds[0][0]) / shape[0],
    )
    tsdf.integrate(batch["rgb"], batch["depth"], batch["cam_intr"],
                   batch["cam_extr"])
    tsdf_vol = tsdf.get_volume()[0]
    prediction = logprobs.argmax(axis=-1)
    empty = (logprobs < args.cutoff).all(axis=-1)
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
    import jax.numpy as jnp

    from ..models import (
        SemAbs3DConfig,
        SemAbsVOOLConfig,
        init_semabs_vool,
        semabs3d_feature_vol,
    )
    from ..models.decoder import implicit_decoder, pointing_attention
    from ..models.nets import RELATION_TO_ID
    from ..ops.fusion import pcwrite

    scene_bounds = ((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9))
    batch = prep_data(args, scene_bounds)
    shape = tuple(args.sampling_shape)

    def build():
        cfg = SemAbsVOOLConfig(
            completion=SemAbs3DConfig(voxel_shape=tuple(args.voxel_shape))
        )
        return cfg, init_semabs_vool

    cfg, params = _load_state_params(args, build)
    grid_points = get_sample_points(shape, scene_bounds).astype(np.float32)
    rs = np.random.RandomState(args.seed)
    dump = Path(args.dump_path) / batch["scene_id"]
    dump.mkdir(parents=True, exist_ok=True)

    for (target, relation, reference) in batch["descriptions"]:
        idx = rs.choice(len(batch["input_xyz_pts"]), size=args.num_input_pts)
        xyz = jnp.asarray(batch["input_xyz_pts"][idx])[None]
        tgt = jnp.asarray(batch["relevancy"][target][idx].astype(np.float32))[
            None, None, :, None
        ]
        ref = jnp.asarray(batch["relevancy"][reference][idx].astype(np.float32))[
            None, None, :, None
        ]
        tvol = semabs3d_feature_vol(params["completion"], cfg.completion, xyz,
                                    tgt, compute_dtype=jnp.bfloat16)
        rvol = semabs3d_feature_vol(params["completion"], cfg.completion, xyz,
                                    ref, compute_dtype=jnp.bfloat16)
        fvol = jnp.concatenate([tvol, rvol], axis=-1)
        rel_emb = params["relation_embeddings"][RELATION_TO_ID[relation]]

        import jax

        chunk = 2**18
        n = len(grid_points)
        pad = (-n) % chunk
        pts_p = np.concatenate([grid_points, np.zeros((pad, 3), np.float32)])
        chunks = jnp.asarray(pts_p.reshape(-1, chunk, 3))

        @jax.jit
        def run(fvol_, chunks_, rel_):
            def body(c):
                sampled = implicit_decoder(
                    params["spatial_sampler"], fvol_, cfg.completion.grid,
                    c[None], cfg.decoder_concat_xyz_pts, channels_last=True,
                )
                return pointing_attention(
                    params["pointer"], sampled, rel_[None, None],
                    cfg.pointing_method, cfg.pointing_dim,
                    cfg.pointing_temperature,
                )[0, :, 0]

            return jax.lax.map(body, chunks_)

        logits = np.asarray(run(fvol, chunks, rel_emb)).reshape(-1)[:n]
        top = logits.max()
        mask = logits > (top - args.vool_band)
        pts = grid_points[mask]
        heat = (logits[mask] - logits[mask].min()) / max(
            1e-9, logits[mask].max() - logits[mask].min()
        )
        try:
            import matplotlib.cm as cm

            colors = (cm.jet(heat)[:, :3] * 255).astype(np.uint8)
        except ImportError:
            colors = np.tile((heat[:, None] * 255).astype(np.uint8), (1, 3))
        desc = f"{target}_{relation}_{reference}".replace(" ", "_")
        path = str(dump / f"{desc}.ply")
        pcwrite(path, np.hstack([pts, colors.astype(np.float32)]))
        logging.info("wrote %s (%d pts)", path, len(pts))
    logging.info("done -> %s", dump)


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

    po = sub.add_parser("ovssc-inference")
    add_common(po)
    pv = sub.add_parser("vool-inference")
    add_common(pv)

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.command == "ovssc-inference":
        cmd_ovssc(args)
    else:
        cmd_vool(args)


if __name__ == "__main__":
    main()
