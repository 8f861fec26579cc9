from m4depth_tpu.geometry.camera import Camera, pixel_grid, scale_camera
from m4depth_tpu.geometry.rotations import rot_mat
from m4depth_tpu.geometry.parallax import (
    depth_to_parallax,
    parallax_to_depth,
    prev_depth_to_parallax,
    parallax_sweep_flows,
    reprojection_flow,
    reproject,
    recompute_depth,
)
from m4depth_tpu.geometry.resize import (
    resize_bilinear_v1,
    resize_bilinear,
    resize_nearest,
)

__all__ = [
    "Camera",
    "pixel_grid",
    "scale_camera",
    "rot_mat",
    "depth_to_parallax",
    "parallax_to_depth",
    "prev_depth_to_parallax",
    "parallax_sweep_flows",
    "reprojection_flow",
    "reproject",
    "recompute_depth",
    "resize_bilinear_v1",
    "resize_bilinear",
    "resize_nearest",
]
