from rgbd360_tpu.ops import se3, camera, undistort, stitch, pyramid

__all__ = ["se3", "camera", "undistort", "stitch", "pyramid"]
