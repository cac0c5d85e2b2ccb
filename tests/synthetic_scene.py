"""Synthetic THOR-style HDF5 scene-file builder for dataset tests.

Writes files that follow the reference's on-disk schema
(generate_relevancy.py:21-60 datasets + region refs; generate_thor_data.py
HDF5 write :1053-1061; dataset.py readers) so the dataset readers can be
exercised without the 269 GB THOR corpus.
"""
import h5py
import numpy as np

from semantic_abstraction_tpu.data.hdf5 import (
    get_datastructure,
    init_dataset,
    resize_and_add_data,
)

RELATIONS_IN_SCENE = ["on", "in", "behind"]


def make_scene(path, rs=None, h=24, w=32, rel_h=12, rel_w=16, num_full_pts=600,
               classes=("chair", "table", "sofa"), num_descs=3):
    rs = rs or np.random.RandomState(0)
    tsdf_dim = (4, 4, 4)
    struct = get_datastructure((h, w), (rel_h, rel_w), tsdf_dim, num_full_pts)
    init_dataset(str(path), struct)

    objid_to_class = (
        ["empty", "out of bounds", "unlabelled"]
        + [f"{c}[{i + 3}]" for i, c in enumerate(classes)]
    )
    num_objs = len(objid_to_class)

    with h5py.File(str(path), "a") as f:
        rgb = rs.randint(0, 255, (1, h, w, 3), np.uint8)
        depth = rs.uniform(0.5, 1.8, (1, h, w)).astype(np.float32)
        seg = rs.randint(-1, num_objs, (1, h, w)).astype(np.int32)
        full_xyz = rs.uniform(-0.9, 1.8, (1, num_full_pts, 3)).astype(np.float32)
        full_objid = rs.randint(0, num_objs, (1, num_full_pts)).astype(np.int32)

        g = f.create_group("data")
        g["rgb"] = np.array(resize_and_add_data(f["rgb"], rgb), h5py.regionref_dtype)
        g["depth"] = np.array(
            resize_and_add_data(f["depth"], depth), h5py.regionref_dtype
        )
        g["seg"] = np.array(resize_and_add_data(f["seg"], seg), h5py.regionref_dtype)
        g["full_xyz_pts"] = np.array(
            resize_and_add_data(f["full_xyz_pts"], full_xyz), h5py.regionref_dtype
        )
        g["full_objid_pts"] = np.array(
            resize_and_add_data(f["full_objid_pts"], full_objid),
            h5py.regionref_dtype,
        )
        g["cam_intr"] = np.array(
            [[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32
        )
        g["cam_pose"] = np.eye(4, dtype=np.float32)
        g["objid_to_class"] = np.array(objid_to_class, dtype="S64")

        # descriptions
        dg = g.create_group("descriptions")
        t_names = [classes[i % len(classes)] for i in range(num_descs)]
        r_names = [classes[(i + 1) % len(classes)] for i in range(num_descs)]
        rels = [RELATIONS_IN_SCENE[i % len(RELATIONS_IN_SCENE)] for i in range(num_descs)]
        dg["target_obj_name"] = np.array(t_names, dtype="S64")
        dg["reference_obj_name"] = np.array(r_names, dtype="S64")
        dg["spatial_relation_name"] = np.array(rels, dtype="S64")
        dg["target_obj_id"] = np.array(
            [3 + (i % len(classes)) for i in range(num_descs)], np.int32
        )

        # saliencies: one per class + full-description sentences + mean
        sentences = [f"{t} {rel} a {r}" for t, rel, r in zip(t_names, rels, r_names)]
        labels = list(classes) + sentences + ["mean"]
        sal = rs.randn(len(labels), rel_h, rel_w).astype(np.float32) * 0.01
        refs = resize_and_add_data(f["saliencies"], sal)
        sg = g.create_group("saliencies")
        key = "rgb|ours"
        sg[key] = np.array(refs, dtype=h5py.regionref_dtype)
        sg[key + "|saliency_text_labels"] = np.array(labels, dtype="S128")
        sg[key + "|saliency_text_label_features"] = rs.randn(
            len(labels), 512
        ).astype(np.float32)
    return str(path)
