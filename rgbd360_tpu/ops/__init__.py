from rgbd360_tpu.ops import (
    bilateral,
    camera,
    filters,
    pallas_kernels,
    pyramid,
    se3,
    segmentation,
    stitch,
    undistort,
)

__all__ = [
    "bilateral",
    "camera",
    "filters",
    "pallas_kernels",
    "pyramid",
    "se3",
    "segmentation",
    "stitch",
    "undistort",
]
