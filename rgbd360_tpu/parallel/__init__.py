from rgbd360_tpu.parallel.sharded import (
    make_mesh,
    sharded_plane_scan,
    distributed_pose_graph,
    sharded_pair_align,
)

__all__ = [
    "make_mesh",
    "sharded_plane_scan",
    "distributed_pose_graph",
    "sharded_pair_align",
]
