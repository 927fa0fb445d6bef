from rgbd360_tpu.calibration.control_planes import (
    ControlPlanes,
    collect_control_planes,
)
from rgbd360_tpu.calibration.solver import (
    PairCalibrator,
    RigCalibrator,
    calibrate_pair_rotation,
    calibrate_pair_translation,
    fim_rotation,
    fim_translation,
    conditioning,
)

__all__ = [
    "ControlPlanes",
    "collect_control_planes",
    "PairCalibrator",
    "RigCalibrator",
    "calibrate_pair_rotation",
    "calibrate_pair_translation",
    "fim_rotation",
    "fim_translation",
    "conditioning",
]
