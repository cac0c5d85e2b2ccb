"""Scene datasets: OVSSC + VOOL HDF5 readers, host-side numpy.

TPU-native re-architecture of the reference's dataset layer (reference:
dataset.py — SceneUnderstandDataset :44-166, ObjectLocalizationDataset
:169-678, SceneCompletionDataset :681-1238, synonyms :23-41). Torch-free:
samples are dicts of numpy arrays with STATIC shapes (fixed
num_input/output points, patches/descs padded), ready to stack into
device batches; ragged work (label selection, balanced subsampling,
domain randomization) all happens here on the host.

Departures from the reference:
- Deterministic RNG: each __getitem__ draws from a per-(seed, epoch, idx)
  RandomState instead of the global numpy RNG, so any sample is
  reproducible regardless of worker scheduling.
- Emits ``padding_mask`` (patches/descs) and integer
  ``spatial_relation_id`` (VOOL) alongside the reference's string fields,
  so the jitted trainer needs no string handling.
- The reference's silent exception fallbacks (identity transform on DR
  failure, replace=True on subsample failure, dataset.py:547-569,
  :1207-1211, :150-156) are kept.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import h5py
import numpy as np

from ..models.nets import RELATION_TO_ID
from .hdf5 import deref_h5py
from .transforms import (
    balanced_subsample_probabilities,
    check_pts_in_frustum_np,
    depth_to_pointcloud_np,
    random_domain_transform,
    resize_bilinear_np,
    transform_filter_subsample,
)

# class -> synonym map driving the "novel vocab" split (dataset.py:23-41)
SYNONYMS = {
    "television": "tv",
    "sofa": "couch",
    "house plant": "plant in a pot",
    "bookcase": "bookshelf",
    "baseball bat": "rawlings big stick maple bat",
    "pillow": "cushion",
    "arm chair": "recliner",
    "bread": "loaf of sourdough",
    "cell phone": "mobile phone",
    "desktop": "computer",
    "dresser": "wardrobe",
    "dumbbell": "gym weights",
    "fridge": "refridgerator",
    "garbage can": "trash can",
    "laptop": "computer",
    "outlet": "eletric plug",
    "stairs": "staircase",
}
INV_SYNONYMS = {v: k for k, v in SYNONYMS.items()}


@dataclasses.dataclass
class DataConfig:
    """Dataset options mirroring the reference flags (utils.py:35-113)."""

    scene_bounds: Tuple = ((-1.0, -1.0, -0.1), (1.0, 1.0, 1.9))
    network_inputs: Tuple[str, ...] = ("saliency",)
    domain_randomization: bool = True
    num_input_pts: int = 80000
    num_output_pts: int = 400000
    num_patches: int = 4
    num_descs: int = 4
    tsdf_shape: Tuple[int, int, int] = (128, 128, 128)
    saliency_config: str = "ours"
    subtract_mean_relevancy: bool = True
    offset_patch_mask: bool = False
    patch_mask_cutoff: float = 0.004
    saliency_vmin: Optional[float] = None
    balance_spatial_relations: bool = True
    balance_spatial_sampling: bool = True
    always_replace_subsample_pts: bool = False
    xyz_pts_noise: float = 0.0
    dr_pos: float = 0.1
    dr_orn: float = 0.3
    dr_scale: float = 0.1
    seed: int = 0


class SceneUnderstandDataset:
    """Base: path bookkeeping + deterministic per-sample RNG."""

    def __init__(
        self,
        file_path: str,
        scene_paths: Sequence[str],
        cfg: DataConfig,
        return_vis: bool = False,
        domain_randomized_rgb: bool = False,
        use_synonyms: bool = False,
        load_gt: bool = True,
    ):
        self.file_path = file_path
        self.keys = sorted(scene_paths)
        self.cfg = cfg
        self.return_vis = return_vis
        self.domain_randomized_rgb = domain_randomized_rgb
        self.use_synonyms = use_synonyms
        self.load_gt = load_gt
        self.epoch = 0

    def __len__(self):
        return len(self.keys)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.RandomState:
        return np.random.RandomState(
            (self.cfg.seed * 1_000_003 + self.epoch * 10_007 + idx) % (2**31)
        )

    def _rgb_key(self) -> str:
        return "domain_randomized_rgb" if self.domain_randomized_rgb else "rgb"

    def _scene_file(self, idx: int) -> str:
        return self.file_path + "/" + self.keys[idx]

    def _scene_id(self, idx: int) -> str:
        return self.keys[idx].split("/")[-1].split(".")[0]


def _apply_synonyms(labels):
    return [SYNONYMS.get(l, l) for l in labels]


class SceneCompletionDataset(SceneUnderstandDataset):
    """OVSSC scene reader (reference dataset.py:681-1238).

    ``use_gt_seg`` enables the oracle-mask mode (dataset.py:734-783):
    ground-truth segmentation masks stand in for CLIP relevancies."""

    def __init__(self, *args, use_gt_seg: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_gt_seg = use_gt_seg
        if use_gt_seg:
            assert not self.use_synonyms
            assert not self.cfg.subtract_mean_relevancy

    def _gt_seg_patches(self, f: h5py.File, rng, num_subsample_patches: int,
                        patch_labels, scene_object_labels):
        """Oracle masks: or-of-instance segs per class, scaled so the x50
        downstream rescale yields (mask - 0.5) (dataset.py:758-771)."""
        patch_objids = {}
        for label in patch_labels:
            patch_objids[label] = {
                int(ol.split("[")[1].split("]")[0])
                for ol in scene_object_labels
                if ol.split("[")[0] == label and "[" in ol
            }
        labels = np.array(list(patch_objids.keys()))
        if num_subsample_patches != -1 and len(labels) > num_subsample_patches:
            idx = rng.choice(len(labels), num_subsample_patches, replace=False)
            labels = labels[idx]
        seg = deref_h5py(f["seg"], f["data/seg"])[0]
        sal = []
        for label in labels:
            mask = np.zeros_like(seg)
            for objid in patch_objids[label]:
                mask = np.logical_or(mask, seg == objid)
            sal.append(mask)
        sal = (np.stack(sal).astype(np.float32) - 0.5) / 50.0
        return {
            "patch_labels": labels,
            "patch_saliencies": sal,
            "patch_label_features": np.zeros((len(labels), 512), np.float32),
            "patch_objmatches": np.array(
                ["|".join(map(str, patch_objids[l])) for l in labels]
            ),
            "num_patches": len(labels),
        }

    def get_scene_patches(self, f: h5py.File, rng, num_subsample_patches: int,
                          full_objid_pts=None, out_of_frustum_pts_mask=None):
        cfg = self.cfg
        prefix = f"data/saliencies/{self._rgb_key()}|{cfg.saliency_config}"
        scene_object_labels = np.array(f["data/objid_to_class"]).astype(str)
        patch_labels = np.array([s.split("[")[0] for s in scene_object_labels])

        if full_objid_pts is not None:
            ids = full_objid_pts
            if out_of_frustum_pts_mask is not None:
                ids = ids[~out_of_frustum_pts_mask]
            scene_obj_ids = set(np.unique(ids).astype(int).tolist())
            visible = set(
                np.unique(deref_h5py(f["seg"], f["data/seg"])[0]).astype(int).tolist()
            ) - {-1}
            scene_obj_ids &= visible
            # sorted: set iteration order is PYTHONHASHSEED-dependent, and
            # _gt_seg_patches consumes this ORDER (patch choice must be
            # reproducible per (seed, epoch, idx) across processes)
            patch_labels = sorted(
                set(patch_labels[sorted(scene_obj_ids)])
                - {"empty", "out of bounds", "unlabelled"}
            )
        if self.use_synonyms:
            patch_labels = _apply_synonyms(patch_labels)

        if self.use_gt_seg:
            assert full_objid_pts is not None
            return self._gt_seg_patches(
                f, rng, num_subsample_patches, patch_labels, scene_object_labels
            )

        text_labels = np.array(f[f"{prefix}|saliency_text_labels"]).astype(str)
        wanted = set(patch_labels)
        assert wanted.issubset(set(text_labels.tolist()))
        sal_idx = np.array(
            [i for i, l in enumerate(text_labels) if l in wanted]
        )
        if num_subsample_patches != -1 and len(sal_idx) > num_subsample_patches:
            sal_idx = rng.choice(sal_idx, num_subsample_patches, replace=False)
            sal_idx.sort()  # hdf5 fancy indexing must be ordered
        out = {
            "patch_labels": text_labels[sal_idx],
            "patch_saliencies": deref_h5py(f["saliencies"], f[prefix][sal_idx]),
            "patch_label_features": np.array(
                f[f"{prefix}|saliency_text_label_features"]
            ).astype(np.float32)[sal_idx],
            "num_patches": len(sal_idx),
        }
        if cfg.subtract_mean_relevancy:
            mean_idx = text_labels.tolist().index("mean")
            mean_rel = np.array(f["saliencies"][mean_idx]).astype(np.float32).squeeze()
            out["patch_saliencies"] = out["patch_saliencies"] - mean_rel

        if full_objid_pts is not None:
            original = out["patch_labels"]
            if self.use_synonyms:
                original = [INV_SYNONYMS.get(l, l) for l in original]
            out["patch_objmatches"] = np.array(
                [
                    "|".join(
                        str(objid)
                        for objid, lab in enumerate(scene_object_labels)
                        if lab.split("[")[0] == pl
                    )
                    for pl in original
                ]
            )
        else:
            out["patch_objmatches"] = np.array([""] * out["num_patches"])
        image_shape = f["rgb"].shape[1:-1]
        out["patch_saliencies"] = resize_bilinear_np(
            out["patch_saliencies"], tuple(image_shape)
        ).astype(np.float32)
        return out

    def __getitem__(self, idx: int) -> dict:
        cfg = self.cfg
        rng = self._rng(idx)
        scene_bounds = np.asarray(cfg.scene_bounds, np.float32)
        r = {}
        with h5py.File(self._scene_file(idx), "r") as f:
            g = f["data"]
            depth = deref_h5py(f["depth"], g["depth"])[0]
            cam_intr = np.array(g["cam_intr"])
            cam_pose = np.array(g["cam_pose"])
            if self.domain_randomized_rgb:
                rgb = np.array(g["domain_randomized_rgb"][0]).astype(np.float32)
            else:
                rgb = np.array(f["rgb"][g["rgb"][0]][0]).astype(np.float32)
            r["rgb"] = rgb
            input_xyz = depth_to_pointcloud_np(depth, cam_intr, cam_pose)
            full_objid = None
            out_of_frustum_full = None
            if "full_objid_pts" in g:
                r["output_xyz_pts"] = deref_h5py(f["full_xyz_pts"], g["full_xyz_pts"])[0]
                full_objid = deref_h5py(f["full_objid_pts"], g["full_objid_pts"])[0].astype(np.int64)
                out_of_frustum_full = ~check_pts_in_frustum_np(
                    r["output_xyz_pts"], depth.shape, cam_pose, cam_intr
                )
            patches = self.get_scene_patches(
                f, rng,
                num_subsample_patches=cfg.num_patches if not self.return_vis else -1,
                full_objid_pts=full_objid,
                out_of_frustum_pts_mask=out_of_frustum_full,
            )

            feature_pts = []
            fdim = 0
            if "rgb" in cfg.network_inputs:
                feature_pts.append(rgb[None] / 255.0)
                fdim += 3
            else:
                sal = patches["patch_saliencies"][..., None]
                if "patch_masks" in cfg.network_inputs:
                    m = sal > cfg.patch_mask_cutoff
                    feature_pts.append(
                        m.astype(np.float32) * 2 - 1 if cfg.offset_patch_mask
                        else m.astype(np.float32)
                    )
                    fdim += 1
                if "saliency" in cfg.network_inputs:
                    s = sal.copy()
                    if cfg.saliency_vmin is not None:
                        s -= cfg.saliency_vmin
                        s[s < 0] = 0
                    feature_pts.append(s * 50.0)  # gradcam scale, README.md:371
                    fdim += 1
            feats = np.concatenate(feature_pts, axis=-1)
            feats = feats.reshape(len(feats), -1, fdim).astype(np.float32)
            if (cfg.num_patches > len(feats) and not self.return_vis
                    and "rgb" not in cfg.network_inputs):
                feats = np.concatenate(
                    [feats, np.zeros((cfg.num_patches - len(feats),) + feats.shape[1:],
                                     np.float32)], axis=0,
                )
            r["input_feature_pts"] = feats

            scf = patches["patch_label_features"]
            if cfg.num_patches > len(scf) and not self.return_vis:
                scf = np.concatenate(
                    [scf, rng.randn(cfg.num_patches - len(scf), *scf.shape[1:])
                     .astype(np.float32)], axis=0,
                )
            r["semantic_class_features"] = scf

            if self.load_gt and full_objid is not None:
                labels = np.zeros((len(scf), len(full_objid)), np.float32)
                for pi, matches in enumerate(patches["patch_objmatches"]):
                    for objid in matches.split("|"):
                        if objid:
                            labels[pi, full_objid == int(objid)] = 1.0
                r["output_label_pts"] = labels
                object_labels = np.array(g["objid_to_class"]).astype(str).tolist()
                oob = np.zeros(len(full_objid), np.float32)
                if "out of bounds" in object_labels:
                    oob = (full_objid == object_labels.index("out of bounds")).astype(np.float32)
                r["out_of_bounds_pts"] = oob

            patch_labels = list(patches["patch_labels"])
            assert all(l != "" for l in patch_labels)
            if not self.return_vis:
                patch_labels += [""] * max(cfg.num_patches - len(patch_labels), 0)
            r["patch_labels"] = patch_labels
            r["scene_id"] = self._scene_id(idx)
            if self.return_vis:
                r["depth"] = depth
                r["cam_intr"] = cam_intr
                r["cam_pose"] = cam_pose
                r["patch_objmatches"] = patches["patch_objmatches"].tolist()
                r["patch_saliencies"] = patches["patch_saliencies"]
                if "objid_to_class" in g:
                    r["vis_gt_object_labels"] = np.array(g["objid_to_class"]).astype(str).tolist()

        transform = None
        if cfg.domain_randomization:
            # SSC hardcodes T 5% / R 0.3 / S 1.0-1.1 (dataset.py:1164-1178)
            transform = random_domain_transform(rng, scene_bounds, 0.05, 0.3, 0.1)

        r["input_xyz_pts"] = input_xyz
        invalid = (depth == 0.0).reshape(-1)
        if invalid.any():
            for k in list(r.keys()):
                if "input" in k and isinstance(r[k], np.ndarray):
                    if r[k].shape[0] == len(invalid):
                        r[k] = r[k][~invalid]
                    elif r[k].ndim > 1 and r[k].shape[1] == len(invalid):
                        r[k] = r[k][:, ~invalid]

        common = dict(
            scene_bounds=scene_bounds,
            always_replace_pts=cfg.always_replace_subsample_pts,
            rng=rng,
        )
        try:
            self._transform_retvals(r, transform, common, depth, cam_intr, cam_pose)
        except Exception:
            # reference catches ALL exceptions and retries without the DR
            # transform (dataset.py:1207-1211). The common real trigger: a
            # transform leaving zero in-bounds points makes the subsample's
            # replace=True retry raise IndexError (empty array), which a
            # narrower except would let crash the run.
            self._transform_retvals(r, None, common, depth, cam_intr, cam_pose)

        if "output_xyz_pts" in r:
            r["out_of_frustum_pts_mask"] = np.stack(
                [
                    ~check_pts_in_frustum_np(x, depth.shape, cam_pose, cam_intr)
                    for x in r["output_xyz_pts"]
                ]
            )
        if cfg.xyz_pts_noise > 0:
            # GT-less (inference-style) scenes have no output_xyz_pts; the
            # reference crashes there (dataset.py:1227-1233 unguarded) so
            # skipping is strictly more usable and cannot diverge from any
            # working reference configuration
            if "output_xyz_pts" in r:
                r["output_xyz_pts"] = r["output_xyz_pts"] + rng.randn(
                    *r["output_xyz_pts"].shape
                ).astype(np.float32) * cfg.xyz_pts_noise
            r["input_xyz_pts"] = r["input_xyz_pts"] + rng.randn(
                *r["input_xyz_pts"].shape
            ).astype(np.float32) * cfg.xyz_pts_noise

        r["padding_mask"] = np.array([l == "" for l in r["patch_labels"]])
        for k, v in r.items():
            if isinstance(v, np.ndarray) and v.dtype in (np.float64,):
                r[k] = v.astype(np.float32)
        return r

    def _transform_retvals(self, r, transform, common, depth, cam_intr, cam_pose):
        """Input/output subsampling + optional TSDF
        (reference dataset.py:874-973)."""
        cfg = self.cfg
        n_in = len(r["input_xyz_pts"])
        inp = transform_filter_subsample(
            xyz_pts=r["input_xyz_pts"],
            num_subsample_pts=cfg.num_input_pts,
            subsample_probabilities=np.full(n_in, 1.0 / n_in),
            transform_matrix=transform,
            input_feature_pts=r["input_feature_pts"],
            **common,
        )
        if "output_label_pts" in r:
            num_out = cfg.num_output_pts if not self.return_vis else -1
            if cfg.balance_spatial_sampling and num_out != -1:
                xyzs, labs, oobs = [], [], []
                for pi in range(len(r["output_label_pts"])):
                    probs = balanced_subsample_probabilities(r["output_label_pts"][pi])
                    o = transform_filter_subsample(
                        xyz_pts=r["output_xyz_pts"],
                        num_subsample_pts=num_out,
                        subsample_probabilities=probs,
                        transform_matrix=transform,
                        out_of_bounds_pts=r["out_of_bounds_pts"],
                        output_label_pts=r["output_label_pts"][pi][None],
                        **common,
                    )
                    xyzs.append(o["xyz_pts"])
                    labs.append(o["output_label_pts"][0])
                    oobs.append(o["out_of_bounds_pts"])
                r["output_xyz_pts"] = np.stack(xyzs)
                r["output_label_pts"] = np.stack(labs)
                r["out_of_bounds_pts"] = np.stack(oobs)
            else:
                n_o = len(r["output_xyz_pts"])
                o = transform_filter_subsample(
                    xyz_pts=r["output_xyz_pts"],
                    num_subsample_pts=num_out,
                    subsample_probabilities=np.full(n_o, 1.0 / n_o),
                    transform_matrix=transform,
                    output_label_pts=r["output_label_pts"],
                    out_of_bounds_pts=r["out_of_bounds_pts"],
                    **common,
                )
                p = len(o["output_label_pts"])
                r["output_xyz_pts"] = np.repeat(o["xyz_pts"][None], p, axis=0)
                r["out_of_bounds_pts"] = np.repeat(o["out_of_bounds_pts"][None], p, axis=0)
                r["output_label_pts"] = o["output_label_pts"]
        r["input_xyz_pts"] = inp["xyz_pts"]
        r["input_feature_pts"] = inp["input_feature_pts"]
        if "tsdf" in cfg.network_inputs:
            from ..ops.fusion import TSDFVolume

            sb = np.asarray(cfg.scene_bounds)
            voxel_size = ((sb[1] - sb[0]) / np.asarray(cfg.tsdf_shape)).min()
            vol = TSDFVolume(sb.T, voxel_size=float(voxel_size))
            final_pose = cam_pose if transform is None else transform @ cam_pose
            vol.integrate(r["rgb"], depth, cam_intr, final_pose)
            r["tsdf_vol"] = vol.get_volume()[0]
        else:
            r["tsdf_vol"] = np.ones(1, np.float32)


class ObjectLocalizationDataset(SceneUnderstandDataset):
    """VOOL scene reader (reference dataset.py:169-678)."""

    def get_descriptions(self, g, rng, num_subsample_descs: int):
        cfg = self.cfg
        prefix = f"saliencies/{self._rgb_key()}|{cfg.saliency_config}"
        dg = g["descriptions"]
        d = {
            "target_obj_name": np.array(dg["target_obj_name"]).astype(str),
            "target_obj_id": np.array(dg["target_obj_id"]),
            "reference_obj_name": np.array(dg["reference_obj_name"]).astype(str),
            "spatial_relation_name": np.array(dg["spatial_relation_name"]).astype(str),
        }
        sentences = np.char.add(
            np.char.add(
                np.char.add(np.char.add(d["target_obj_name"], " "),
                            d["spatial_relation_name"]),
                " a ",
            ),
            d["reference_obj_name"],
        )
        if self.use_synonyms:
            has_syn = np.array(
                [any(s in sent for s in SYNONYMS) for sent in sentences]
            )
            for k in list(d.keys()):
                d[k] = d[k][has_syn]
            sentences = sentences[has_syn]
        num_descs = len(sentences)
        desc_idx = np.arange(num_descs)
        if num_subsample_descs != -1 and num_subsample_descs < num_descs:
            p = np.ones(num_descs, np.float64)
            if cfg.balance_spatial_relations:
                rels = d["spatial_relation_name"]
                for rel in np.unique(rels):
                    m = rels == rel
                    p[m] = 1.0 / m.sum()
            p /= p.sum()
            desc_idx = rng.choice(num_descs, num_subsample_descs, replace=False, p=p)
            desc_idx.sort()
        for k in list(d.keys()):
            d[k] = d[k][desc_idx]
        sentences = sentences[desc_idx]
        if self.use_synonyms:
            d["target_obj_name"] = np.array(_apply_synonyms(d["target_obj_name"]))
            d["reference_obj_name"] = np.array(_apply_synonyms(d["reference_obj_name"]))

        text_labels = np.array(g[f"{prefix}|saliency_text_labels"]).astype(str).tolist()
        d["target_obj_saliency_refs"] = [
            g[prefix][text_labels.index(n)] for n in d["target_obj_name"]
        ]
        d["reference_obj_saliency_refs"] = [
            g[prefix][text_labels.index(n)] for n in d["reference_obj_name"]
        ]
        d["description_saliency_refs"] = [
            g[prefix][text_labels.index(s)] for s in sentences
        ]
        missing = num_subsample_descs - len(d["spatial_relation_name"])
        if missing > 0 and num_subsample_descs != -1:
            d["target_obj_id"] = np.concatenate(
                [d["target_obj_id"], np.full(missing, -2, d["target_obj_id"].dtype)]
            )
            for k in ("spatial_relation_name", "target_obj_name", "reference_obj_name"):
                d[k] = np.array(d[k].tolist() + ["[pad]"] * missing)
        d["num_descs"] = len(d["spatial_relation_name"])
        return d

    def __getitem__(self, idx: int) -> dict:
        cfg = self.cfg
        rng = self._rng(idx)
        scene_bounds = np.asarray(cfg.scene_bounds, np.float32)
        r = {}
        with h5py.File(self._scene_file(idx), "r") as f:
            g = f["data"]
            depth = deref_h5py(f["depth"], g["depth"])[0]
            cam_intr = np.array(g["cam_intr"])
            cam_pose = np.array(g["cam_pose"])
            if self.domain_randomized_rgb:
                rgb = np.array(g["domain_randomized_rgb"]).astype(np.float32)[0]
            else:
                rgb = deref_h5py(f["rgb"], g["rgb"])[0]
            image_shape = rgb.shape[:2]
            r["rgb"] = rgb / 255.0
            r["input_xyz_pts"] = depth_to_pointcloud_np(depth, cam_intr, cam_pose)
            full_objid = None
            if "full_objid_pts" in g:
                r["output_xyz_pts"] = deref_h5py(f["full_xyz_pts"], g["full_xyz_pts"])[0]
                full_objid = deref_h5py(f["full_objid_pts"], g["full_objid_pts"])[0]
                r["out_of_bounds_pts"] = np.zeros(len(full_objid), np.float32)
            descs = self.get_descriptions(
                g, rng,
                num_subsample_descs=cfg.num_descs if not self.return_vis else -1,
            )
            r["spatial_relation_name"] = descs["spatial_relation_name"].tolist()
            for key, refs in (
                ("input_target_saliency_pts", descs["target_obj_saliency_refs"]),
                ("input_reference_saliency_pts", descs["reference_obj_saliency_refs"]),
                ("input_description_saliency_pts", descs["description_saliency_refs"]),
            ):
                r[key] = deref_h5py(f["saliencies"], refs)
            prefix = f"data/saliencies/{self._rgb_key()}|{cfg.saliency_config}"
            text_labels = np.array(f[f"{prefix}|saliency_text_labels"]).astype(str)
            mean_idx = text_labels.tolist().index("mean")
            mean_rel = np.array(f["saliencies"][mean_idx]).astype(np.float32).squeeze()
            for k in ("input_target_saliency_pts", "input_reference_saliency_pts",
                      "input_description_saliency_pts"):
                if cfg.subtract_mean_relevancy:
                    r[k] = r[k] - mean_rel
                if cfg.saliency_vmin is not None:
                    r[k] = r[k] - cfg.saliency_vmin
                    r[k][r[k] < 0] = 0
                r[k] = resize_bilinear_np(r[k], tuple(image_shape))
                # explicit size: -1 reshape fails for 0-desc (all-filtered) scenes
                r[k] = (
                    r[k].reshape(len(r[k]), int(np.prod(image_shape)), 1) * 50.0
                ).astype(np.float32)
                if "patch_masks" in cfg.network_inputs:
                    # reference QUIRK: VOOL multiplies by 50 BEFORE the
                    # cutoff (dataset.py:429 then :430-441), so the 0.004
                    # cutoff acts on the x50 scale (raw 8e-5) — unlike
                    # SceneCompletionDataset, which thresholds the raw
                    # values (dataset.py:1031-1047)
                    r[k] = (r[k] > cfg.patch_mask_cutoff).astype(np.float32)
            nd = len(descs["spatial_relation_name"])
            r["input_rgb_pts"] = np.repeat(
                (rgb / 255.0).reshape(1, -1, 3), nd, axis=0
            ).astype(np.float32)
            for k in ("input_target_saliency_pts", "input_reference_saliency_pts",
                      "input_description_saliency_pts"):
                if len(r[k]) < nd:
                    pad = np.zeros((nd - len(r[k]),) + r[k].shape[1:], np.float32)
                    r[k] = np.concatenate([r[k], pad], axis=0)

            if full_objid is not None:
                labels = np.zeros((len(descs["target_obj_id"]), len(full_objid)),
                                  np.float32)
                for di, tid in enumerate(descs["target_obj_id"]):
                    labels[di] = full_objid == tid
                r["output_label_pts"] = labels
            r["scene_id"] = self._scene_id(idx)
            r["target_obj_name"] = descs["target_obj_name"].tolist()
            r["reference_obj_name"] = descs["reference_obj_name"].tolist()
            if self.return_vis:
                r["depth"] = depth
                r["cam_intr"] = cam_intr
                r["cam_pose"] = cam_pose
                if "objid_to_class" in g:
                    r["vis_gt_object_labels"] = np.array(g["objid_to_class"]).astype(str).tolist()

        transform = None
        if cfg.domain_randomization:
            transform = random_domain_transform(
                rng, scene_bounds, cfg.dr_pos, cfg.dr_orn, cfg.dr_scale
            )
        common = dict(
            scene_bounds=scene_bounds,
            always_replace_pts=cfg.always_replace_subsample_pts,
            rng=rng,
        )
        n_in = len(r["input_xyz_pts"])
        side = dict(
            input_target_saliency_pts=r["input_target_saliency_pts"],
            input_reference_saliency_pts=r["input_reference_saliency_pts"],
            input_description_saliency_pts=r["input_description_saliency_pts"],
            input_rgb_pts=r["input_rgb_pts"],
        )
        try:
            inp = transform_filter_subsample(
                xyz_pts=r["input_xyz_pts"],
                num_subsample_pts=cfg.num_input_pts,
                subsample_probabilities=np.full(n_in, 1.0 / n_in),
                transform_matrix=transform,
                **side, **common,
            )
        except Exception:
            # reference catches ALL exceptions (dataset.py:558-569) and
            # nulls kwargs["transform_matrix"], which the tsdf and output
            # blocks then reuse — hence transform=None here propagates
            transform = None
            inp = transform_filter_subsample(
                xyz_pts=r["input_xyz_pts"],
                num_subsample_pts=cfg.num_input_pts,
                subsample_probabilities=np.full(n_in, 1.0 / n_in),
                transform_matrix=None,
                **side, **common,
            )
        r["input_xyz_pts"] = inp["xyz_pts"]
        for k in side:
            r[k] = inp[k]

        if "tsdf" in cfg.network_inputs:
            from ..ops.fusion import TSDFVolume

            sb = np.asarray(cfg.scene_bounds)
            voxel_size = ((sb[1] - sb[0]) / np.asarray(cfg.tsdf_shape)).min()
            vol = TSDFVolume(sb.T, voxel_size=float(voxel_size))
            final_pose = cam_pose if transform is None else transform @ cam_pose
            # reference integrates the /255-normalized image here
            # (dataset.py:345, :591) — unlike SceneCompletionDataset, which
            # integrates raw 0-255. Only the (currently discarded) color
            # volume differs, but keep the stored volume byte-faithful.
            vol.integrate(rgb / 255.0, depth, cam_intr, final_pose)
            r["tsdf_vol"] = vol.get_volume()[0]
        else:
            r["tsdf_vol"] = np.ones(1, np.float32)

        if "output_label_pts" in r:
            num_out = cfg.num_output_pts if not self.return_vis else -1
            if cfg.balance_spatial_sampling and num_out != -1:
                xyzs, labs, oobs = [], [], []
                for di in range(len(r["output_label_pts"])):
                    probs = balanced_subsample_probabilities(r["output_label_pts"][di])
                    o = transform_filter_subsample(
                        xyz_pts=r["output_xyz_pts"],
                        num_subsample_pts=num_out,
                        subsample_probabilities=probs,
                        transform_matrix=transform,
                        output_label_pts=r["output_label_pts"][di][None],
                        out_of_bounds_pts=r["out_of_bounds_pts"],
                        **common,
                    )
                    xyzs.append(o["xyz_pts"])
                    labs.append(o["output_label_pts"][0])
                    oobs.append(o["out_of_bounds_pts"])
                r["output_xyz_pts"] = np.stack(xyzs)
                r["output_label_pts"] = np.stack(labs)
                r["out_of_bounds_pts"] = np.stack(oobs)
            else:
                n_o = len(r["output_xyz_pts"])
                o = transform_filter_subsample(
                    xyz_pts=r["output_xyz_pts"],
                    num_subsample_pts=num_out,
                    subsample_probabilities=np.full(n_o, 1.0 / n_o),
                    transform_matrix=transform,
                    output_label_pts=r["output_label_pts"],
                    out_of_bounds_pts=r["out_of_bounds_pts"],
                    **common,
                )
                nd = len(o["output_label_pts"])
                r["output_xyz_pts"] = np.repeat(o["xyz_pts"][None], nd, axis=0)
                r["out_of_bounds_pts"] = np.repeat(o["out_of_bounds_pts"][None], nd, axis=0)
                r["output_label_pts"] = o["output_label_pts"]

        if cfg.xyz_pts_noise > 0:
            # GT-less (inference-style) scenes have no output_xyz_pts; the
            # reference crashes there (dataset.py:1227-1233 unguarded) so
            # skipping is strictly more usable and cannot diverge from any
            # working reference configuration
            if "output_xyz_pts" in r:
                r["output_xyz_pts"] = r["output_xyz_pts"] + rng.randn(
                    *r["output_xyz_pts"].shape
                ).astype(np.float32) * cfg.xyz_pts_noise
            r["input_xyz_pts"] = r["input_xyz_pts"] + rng.randn(
                *r["input_xyz_pts"].shape
            ).astype(np.float32) * cfg.xyz_pts_noise
        if "output_xyz_pts" in r and r["output_xyz_pts"].ndim == 3:
            r["out_of_frustum_pts_mask"] = np.stack(
                [
                    ~check_pts_in_frustum_np(x, depth.shape, cam_pose, cam_intr)
                    for x in r["output_xyz_pts"]
                ]
            )
        r["padding_mask"] = np.array(
            [s == "[pad]" for s in r["spatial_relation_name"]]
        )
        r["spatial_relation_id"] = np.array(
            [RELATION_TO_ID[s] for s in r["spatial_relation_name"]], np.int32
        )
        return r
