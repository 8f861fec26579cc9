from m4depth_tpu.ops.warp import dense_image_warp
from m4depth_tpu.ops.cost_volume import (
    parallax_sweeping_cv,
    parallax_sweeping_cv_expanded,
    parallax_sweeping_cv_flat,
    parallax_sweeping_cv_split,
    spatial_cost_volume,
)

__all__ = [
    "dense_image_warp",
    "parallax_sweeping_cv",
    "parallax_sweeping_cv_expanded",
    "parallax_sweeping_cv_flat",
    "parallax_sweeping_cv_split",
    "spatial_cost_volume",
]
