from rgbd360_tpu.core.frame import RigFrame, SphereFrame, FrameBuilder

__all__ = ["RigFrame", "SphereFrame", "FrameBuilder"]
