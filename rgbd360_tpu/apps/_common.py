"""Shared CLI plumbing for the application entry points."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

DEFAULT_CALIB = "/root/reference/Calibration"


def add_calib_args(p: argparse.ArgumentParser):
    p.add_argument(
        "--calib",
        default=DEFAULT_CALIB,
        help="calibration root containing Extrinsics/ and Intrinsics/",
    )
    p.add_argument(
        "--no-intrinsics",
        action="store_true",
        help="skip CLAMS depth undistortion models",
    )


def load_calib(args):
    from rgbd360_tpu.io.calib import load_calibration

    root = Path(args.calib)
    intr = None if args.no_intrinsics else root / "Intrinsics"
    if intr is not None and not intr.exists():
        intr = None
    return load_calibration(root / "Extrinsics", intr)


def save_trajectory_txt(path, poses):
    """TUM-style trajectory: idx tx ty tz qw qx qy qz."""
    rows = []
    for i, t in enumerate(np.asarray(poses)):
        r = t[:3, :3]
        qw = np.sqrt(max(0.0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
        qx = (r[2, 1] - r[1, 2]) / max(4 * qw, 1e-9)
        qy = (r[0, 2] - r[2, 0]) / max(4 * qw, 1e-9)
        qz = (r[1, 0] - r[0, 1]) / max(4 * qw, 1e-9)
        rows.append([i, *t[:3, 3], qw, qx, qy, qz])
    np.savetxt(path, np.asarray(rows), fmt="%.6f")
