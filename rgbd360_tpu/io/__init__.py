from rgbd360_tpu.io.bin_format import read_rig_frame, write_rig_frame, RawRigFrame
from rgbd360_tpu.io.clams import load_clams_model, ClamsModel
from rgbd360_tpu.io.calib import load_calibration, Calibration
from rgbd360_tpu.io.dataset import SequenceDataset, StreamingDataset
from rgbd360_tpu.io.pbmap import (
    PbPlane,
    pbplanes_to_planeset,
    planeset_to_pbplanes,
    read_pbmap,
    write_pbmap,
)
from rgbd360_tpu.io.rawlog import (
    Obs2DRangeScan,
    Obs3DRangeScan,
    TCamera,
    assemble_rig_frames,
    read_rawlog,
    write_rawlog,
)

__all__ = [
    "Obs2DRangeScan",
    "Obs3DRangeScan",
    "TCamera",
    "assemble_rig_frames",
    "read_rawlog",
    "write_rawlog",
    "read_rig_frame",
    "write_rig_frame",
    "RawRigFrame",
    "load_clams_model",
    "ClamsModel",
    "load_calibration",
    "Calibration",
    "SequenceDataset",
    "StreamingDataset",
    "PbPlane",
    "pbplanes_to_planeset",
    "planeset_to_pbplanes",
    "read_pbmap",
    "write_pbmap",
]
