"""Frame-to-frame spherical odometry over a capture directory
(reference `Registration/OdometryRGBD360.cpp` and `OdometryKeyFrame360.cpp`;
`--online` is the live-capture variant, `OnlineOdometryRGBD360.cpp:80-117`,
consuming frames as a grabber process writes them).

Usage:
    python -m rgbd360_tpu.apps.odometry DATASET_DIR [--out DIR] [--keyframe]
        [--online [--idle-timeout S]]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from rgbd360_tpu.apps._common import add_calib_args, load_calib, save_trajectory_txt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", help="directory with sphere_images_*.bin")
    p.add_argument("--out", default=None)
    p.add_argument(
        "--keyframe",
        action="store_true",
        help="keyframe odometry (track against the last keyframe instead of "
        "the previous frame, reference OdometryKeyFrame360)",
    )
    p.add_argument(
        "--online",
        action="store_true",
        help="consume frames live as a grabber writes them into DATASET_DIR "
        "(reference OnlineOdometryRGBD360); stream ends on a 'capture_done' "
        "marker file or after --idle-timeout seconds without a new frame",
    )
    p.add_argument("--idle-timeout", type=float, default=10.0)
    add_calib_args(p)
    args = p.parse_args(argv)

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.dataset import SequenceDataset, StreamingDataset
    from rgbd360_tpu.slam.odometry import FrameToFrameOdometry, KeyframeSLAM

    from rgbd360_tpu.apps._common import frame_config

    calib = load_calib(args)
    builder = FrameBuilder(calib, frame_config(args))
    if args.online:
        ds = StreamingDataset(args.dataset, idle_timeout=args.idle_timeout)
    else:
        ds = SequenceDataset(args.dataset)
        if len(ds) == 0:
            raise SystemExit(f"no sphere_images_*.bin found in {args.dataset}")

    tracker = (
        KeyframeSLAM(builder) if args.keyframe else FrameToFrameOdometry(builder)
    )
    for i, raw in enumerate(ds):
        ev = tracker.process(raw)
        pose = tracker.trajectory[-1]
        extra = f" kf={ev.get('keyframe')}" if args.keyframe else ""
        print(
            f"frame {ds.indices[i]}: t={np.round(pose[:3, 3], 3).tolist()} "
            f"res={ev.get('av_depth_residual', 0):.3f}{extra}"
        )

    traj = np.stack(tracker.trajectory)
    length = float(np.sum(np.linalg.norm(np.diff(traj[:, :3, 3], axis=0), axis=1)))
    print(f"trajectory: {len(traj)} frames, path length {length:.3f} m")
    if args.out:
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        save_trajectory_txt(outdir / "trajectory.txt", traj)
        from rgbd360_tpu.utils.viz import save_trajectory_ply

        save_trajectory_ply(outdir / "trajectory.ply", traj)
        print(f"saved trajectory to {outdir}")
    return traj


if __name__ == "__main__":
    main()
