from rgbd360_tpu.registration.dense import (
    DenseAligner,
    FramePyramid,
    AlignResult,
    PHOTO_CONSISTENCY,
    DEPTH_CONSISTENCY,
    PHOTO_DEPTH,
)

__all__ = [
    "DenseAligner",
    "FramePyramid",
    "AlignResult",
    "PHOTO_CONSISTENCY",
    "DEPTH_CONSISTENCY",
    "PHOTO_DEPTH",
]
