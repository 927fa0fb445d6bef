"""Register a pair of rig captures (reference `Registration/RegisterPairRGBD360.cpp`).

PbMap plane registration (PLANAR_3DoF) followed by GICP refinement (the
reference refines with PCL GICP, `:112-142`; here the plane-to-plane
covariance metric runs as projective ICP on the spherical grids); prints
matches and both poses, optionally exports aligned clouds + overlay images.

Usage:
    python -m rgbd360_tpu.apps.register_pair F1.bin F2.bin [--out DIR] [--dense]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from rgbd360_tpu.apps._common import add_calib_args, load_calib, matcher_config
from rgbd360_tpu.ops.pyramid import build_depth_pyramid


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("frame1")
    p.add_argument("frame2")
    p.add_argument("--out", default=None, help="export directory")
    p.add_argument("--dense", action="store_true", help="also run dense photo+depth")
    p.add_argument(
        "--bilinear",
        action="store_true",
        help="validity-weighted bilinear target sampling for the dense stage "
        "(sub-pixel warp; beyond the reference's nearest rounding)",
    )
    add_calib_args(p)
    args = p.parse_args(argv)

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.registration.icp import GICP, ICPAligner
    from rgbd360_tpu.registration.planes import PLANAR_3DOF, PlaneRegistration

    calib = load_calib(args)
    builder = FrameBuilder(calib)
    f1 = builder.build_from_raw(read_rig_frame(args.frame1))
    f2 = builder.build_from_raw(read_rig_frame(args.frame2))
    ps1 = builder.segment_planes(f1)
    ps2 = builder.segment_planes(f2)

    reg = PlaneRegistration(matcher_config(args))
    res = reg.register(ps1, ps2, mode=PLANAR_3DOF)
    pose_pb = np.asarray(res.pose)
    print(f"PbMap: success={bool(res.success)} matches={int(res.n_matches)} "
          f"areaMatched={float(res.area_matched):.1f}")
    print(f"  t = {np.round(pose_pb[:3, 3], 4).tolist()}  "
          f"|t| = {np.linalg.norm(pose_pb[:3, 3]):.4f} m")

    # GICP refinement seeded by the plane pose (x_1 = T x_2: align(2, 1)),
    # the reference's plane-to-plane metric (RegisterPairRGBD360.cpp:112-142)
    icp = ICPAligner(builder.config.dense, variant=GICP)
    pyr1 = tuple(build_depth_pyramid(f1.sphere_depth, 4))
    pyr2 = tuple(build_depth_pyramid(f2.sphere_depth, 4))
    pose_icp, hess, err, n = icp.align(pyr2, pyr1, jnp.asarray(pose_pb))
    pose_icp = np.asarray(pose_icp)
    print(f"GICP refine: rms={float(err):.4f} over {int(n)} correspondences")
    print(f"  t = {np.round(pose_icp[:3, 3], 4).tolist()}  "
          f"|t| = {np.linalg.norm(pose_icp[:3, 3]):.4f} m")

    out = {"pbmap": pose_pb.tolist(), "icp": pose_icp.tolist(),
           "pbmap_info": np.asarray(res.information).tolist(),
           "matches": int(res.n_matches), "icp_rms": float(err)}

    if args.dense:
        from rgbd360_tpu.ops import stitch as stitch_ops
        from rgbd360_tpu.registration import dense as D

        seam = stitch_ops.seam_mask_from_maps(builder.maps, 1)
        from dataclasses import replace as _dc_replace

        cfg = _dc_replace(builder.config.dense, bilinear=args.bilinear)
        p1 = D.build_frame_pyramid(f1.sphere_gray, f1.sphere_depth, cfg, seam)
        p2 = D.build_frame_pyramid(f2.sphere_gray, f2.sphere_depth, cfg, seam)
        # align(src=2, trg=1) -> T_1<-2, comparable with the PbMap pose
        dres = D.DenseAligner(cfg).align(p2, p1, jnp.asarray(pose_pb))
        pose_d = np.asarray(dres.pose)
        print(f"Dense: avPhoto={float(dres.av_photo_residual):.4f} "
              f"avDepth={float(dres.av_depth_residual):.4f} sso={float(dres.sso):.3f}")
        print(f"  t = {np.round(pose_d[:3, 3], 4).tolist()}  "
              f"|t| = {np.linalg.norm(pose_d[:3, 3]):.4f} m")
        out["dense"] = pose_d.tolist()

    if args.out:
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        from rgbd360_tpu.ops import camera, se3
        from rgbd360_tpu.utils.viz import bgr_to_rgb, save_ply, save_png

        json.dump(out, open(outdir / "poses.json", "w"), indent=1)
        save_png(outdir / "sphere1.png", bgr_to_rgb(np.asarray(f1.sphere_rgb)))
        save_png(outdir / "sphere2.png", bgr_to_rgb(np.asarray(f2.sphere_rgb)))
        pts1 = camera.sphere_backproject(f1.sphere_depth)
        pts2 = camera.sphere_backproject(f2.sphere_depth)
        pts2_in_1 = se3.transform_points(jnp.asarray(pose_icp), pts2.reshape(-1, 3))
        both = np.vstack([np.asarray(pts1).reshape(-1, 3), np.asarray(pts2_in_1)])
        col1 = np.asarray(f1.sphere_rgb).reshape(-1, 3)[:, ::-1]
        col2 = np.asarray(f2.sphere_rgb).reshape(-1, 3)[:, ::-1]
        valid = np.concatenate(
            [np.asarray(f1.sphere_depth).reshape(-1) > 0,
             np.asarray(f2.sphere_depth).reshape(-1) > 0]
        )
        n_pts = save_ply(outdir / "aligned_pair.ply", both, np.vstack([col1, col2]), valid)
        print(f"exported {n_pts} points to {outdir}/aligned_pair.ply")
    return out


if __name__ == "__main__":
    main()
