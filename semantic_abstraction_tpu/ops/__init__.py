from .geometry import (
    transform_pointcloud,
    filter_pts_bounds,
    depth_to_pointcloud,
    project_pts_to_2d,
    check_pts_in_frustum,
)
from .voxel import VoxelGrid
from .fusion import (
    TSDFVolume,
    get_view_frustum,
    meshwrite,
    pcwrite,
    rigid_transform,
)
from .marching import marching_tetrahedra
from .sampling import (
    trilinear_sample,
    grid_sample_3d,
    resize_bilinear,
    resize_matrix,
    resize_bicubic_pil,
)

__all__ = [
    "transform_pointcloud",
    "filter_pts_bounds",
    "depth_to_pointcloud",
    "project_pts_to_2d",
    "check_pts_in_frustum",
    "VoxelGrid",
    "trilinear_sample",
    "grid_sample_3d",
    "resize_bilinear",
    "resize_matrix",
    "resize_bicubic_pil",
    "TSDFVolume",
    "get_view_frustum",
    "meshwrite",
    "pcwrite",
    "rigid_transform",
    "marching_tetrahedra",
]
