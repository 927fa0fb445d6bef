from rgbd360_tpu.registration.dense import (
    DenseAligner,
    FramePyramid,
    AlignResult,
    PHOTO_CONSISTENCY,
    DEPTH_CONSISTENCY,
    PHOTO_DEPTH,
    build_frame_pyramid,
)
from rgbd360_tpu.registration.rig_dense import RigDenseAligner, build_rig_pyramid

__all__ = [
    "DenseAligner",
    "RigDenseAligner",
    "FramePyramid",
    "AlignResult",
    "PHOTO_CONSISTENCY",
    "DEPTH_CONSISTENCY",
    "PHOTO_DEPTH",
    "build_frame_pyramid",
    "build_rig_pyramid",
]
