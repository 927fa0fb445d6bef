"""rgbd360_tpu — a TPU-native omnidirectional RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the RGBD360
reference codebase (omnidirectional RGB-D SLAM with an 8-sensor ring rig):
data I/O, spherical frame construction, plane-based and dense registration,
keyframe odometry, loop closure, pose-graph optimization, topological mapping,
relocalization, labeling, and extrinsic calibration.

Design stance (TPU-first, not a port):
  * All numeric state is JAX arrays in fixed-shape dense layout; variable-size
    structures (plane sets, keyframe graphs) are fixed-capacity padded arrays
    with validity masks so every pipeline stage is jittable.
  * Per-sensor / per-pixel OpenMP fan-out in the reference becomes vmap/XLA
    vectorization on one chip; map-scale stages (loop closure search, pose
    graph BA) shard over a `jax.sharding.Mesh`.
  * Host Python orchestrates the sequential SLAM loop; each per-frame step is
    one jitted function.
"""

__version__ = "0.1.0"

from rgbd360_tpu.config import FrameworkConfig, default_config

__all__ = ["FrameworkConfig", "default_config", "__version__"]
