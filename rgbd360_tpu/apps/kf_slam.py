"""Keyframe SLAM over a capture directory (reference `SLAM/KFsphere_SLAM.cpp`).

Usage:
    python -m rgbd360_tpu.apps.kf_slam DATASET_DIR [--out DIR]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from rgbd360_tpu.apps._common import add_calib_args, load_calib, save_trajectory_txt


def export_map(slam, outdir: Path, voxel: float = 0.05):
    """Write the global voxel-filtered map cloud, trajectory, and map state
    (the Map360_Visualizer 'voxelized global map' view as files)."""
    import jax.numpy as jnp

    from rgbd360_tpu.ops import camera, se3
    from rgbd360_tpu.ops.filters import voxel_downsample
    from rgbd360_tpu.utils.viz import save_ply, save_trajectory_ply

    n_kf = int(slam.map.n_kf)
    pts_all, col_all = [], []
    for k in range(n_kf):
        d = np.asarray(slam.map.depth[k], np.float32)
        pts = camera.sphere_backproject(jnp.asarray(d))
        pose = jnp.asarray(np.asarray(slam.map.opt_poses[k]))
        pts_w = se3.transform_points(pose, pts.reshape(-1, 3))
        mask = d.reshape(-1) > 0
        pts_all.append(np.asarray(pts_w)[mask][::4])
        g = np.asarray(slam.map.gray[k], np.float32).reshape(-1)[mask][::4]
        col_all.append(np.stack([g * 255] * 3, axis=1))
    pts = np.vstack(pts_all)
    cols = np.vstack(col_all)
    pts_v, cols_v = voxel_downsample(pts, voxel, cols)
    n = save_ply(outdir / "map.ply", pts_v, cols_v)
    save_trajectory_ply(outdir / "trajectory.ply", np.stack(slam.trajectory))
    slam.map.save(str(outdir / "map.npz"))
    print(f"map: {n} voxelized points -> {outdir}/map.ply; state -> map.npz")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset")
    p.add_argument("--out", default=None)
    p.add_argument("--pbmap", action="store_true",
                   help="PbMap-tracking graph SLAM (reference SphereGraphSLAM)")
    add_calib_args(p)
    args = p.parse_args(argv)

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.dataset import SequenceDataset
    from rgbd360_tpu.slam.odometry import KeyframeSLAM
    from rgbd360_tpu.slam.pbmap_slam import PbMapGraphSLAM

    calib = load_calib(args)
    builder = FrameBuilder(calib)
    ds = SequenceDataset(args.dataset)
    if len(ds) == 0:
        raise SystemExit(f"no sphere_images_*.bin found in {args.dataset}")

    slam = PbMapGraphSLAM(builder) if args.pbmap else KeyframeSLAM(builder)
    for i, raw in enumerate(ds):
        ev = slam.process(raw)
        pose = slam.trajectory[-1]
        print(
            f"frame {ds.indices[i]}: kf={ev.get('keyframe')} "
            f"lc={ev.get('loop_closures', 0)} t={np.round(pose[:3, 3], 3).tolist()}"
        )

    n_kf = int(slam.map.n_kf)
    print(
        f"done: {n_kf} keyframes, {int(slam.map.n_edges)} edges, "
        f"{int(slam.map.n_areas)} areas"
    )
    if args.out:
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        save_trajectory_txt(outdir / "trajectory.txt", np.stack(slam.trajectory))
        export_map(slam, outdir)
    return slam


if __name__ == "__main__":
    main()
