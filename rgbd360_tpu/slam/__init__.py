from rgbd360_tpu.slam.graph import PoseGraph, optimize_pose_graph
from rgbd360_tpu.slam.map import Map360

__all__ = ["PoseGraph", "optimize_pose_graph", "Map360"]
