"""Compare registration methods on a frame pair
(reference `Registration/MethodsRegisterRGBD360.cpp`).

Runs PbMap, dense photo, dense depth, dense photo+depth, ICP point-to-point,
point-to-plane and GICP (the reference's `RegisterPairRGBD360` refinement
metric) on the same pair, reporting pose, timing, and agreement.

Usage:
    python -m rgbd360_tpu.apps.benchmark_registration F1.bin F2.bin
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax

from rgbd360_tpu.apps._common import add_calib_args, load_calib


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("frame1")
    p.add_argument("frame2")
    p.add_argument("--repeats", type=int, default=3)
    add_calib_args(p)
    args = p.parse_args(argv)

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.ops import stitch as stitch_ops
    from rgbd360_tpu.ops.pyramid import build_depth_pyramid
    from rgbd360_tpu.registration import dense as D
    from rgbd360_tpu.registration.icp import (
        GICP,
        ICPAligner,
        POINT_TO_PLANE,
        POINT_TO_POINT,
    )
    from rgbd360_tpu.registration.planes import PLANAR_3DOF, PlaneRegistration

    calib = load_calib(args)
    builder = FrameBuilder(calib)
    f1 = builder.build_from_raw(read_rig_frame(args.frame1))
    f2 = builder.build_from_raw(read_rig_frame(args.frame2))
    ps1, ps2 = builder.segment_planes(f1), builder.segment_planes(f2)
    cfg = builder.config.dense
    seam = stitch_ops.seam_mask_from_maps(builder.maps, 1)
    p1 = D.build_frame_pyramid(f1.sphere_gray, f1.sphere_depth, cfg, seam)
    p2 = D.build_frame_pyramid(f2.sphere_gray, f2.sphere_depth, cfg, seam)
    dp1 = tuple(build_depth_pyramid(f1.sphere_depth, 4))
    dp2 = tuple(build_depth_pyramid(f2.sphere_depth, 4))

    results = {}

    def bench(name, fn):
        out = fn()  # warm-up/compile
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.repeats):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.repeats * 1000
        return out, dt

    reg = PlaneRegistration(builder.config.matcher)
    res, ms = bench("pbmap", lambda: reg.register(ps1, ps2, mode=PLANAR_3DOF))
    results["pbmap"] = (np.asarray(res.pose), ms, f"matches={int(res.n_matches)}")
    results["pbmap"] += (np.asarray(res.information),)

    al = D.DenseAligner(cfg)
    for name, method in [
        ("dense_photo", D.PHOTO_CONSISTENCY),
        ("dense_depth", D.DEPTH_CONSISTENCY),
        ("dense_both", D.PHOTO_DEPTH),
    ]:
        res, ms = bench(name, lambda m=method: al.align(p2, p1, method=m))
        results[name] = (
            np.asarray(res.pose), ms,
            f"avd={float(res.av_depth_residual):.2f} sso={float(res.sso):.2f}",
        )

    # sub-pixel variant (validity-weighted bilinear target sampling)
    from dataclasses import replace as _dc_replace

    cfg_bl = _dc_replace(cfg, bilinear=True)
    al_bl = D.DenseAligner(cfg_bl)
    # pyramids do not depend on the bilinear flag — reuse the ones above
    res, ms = bench("dense_bilerp", lambda: al_bl.align(p2, p1, method=D.PHOTO_DEPTH))
    results["dense_bilerp"] = (
        np.asarray(res.pose), ms,
        f"avd={float(res.av_depth_residual):.2f} sso={float(res.sso):.2f}",
    )

    for name, var in [
        ("icp_point", POINT_TO_POINT),
        ("icp_plane", POINT_TO_PLANE),
        ("gicp", GICP),
    ]:
        icp = ICPAligner(cfg, variant=var)
        (pose, hess, err, n), ms = bench(name, lambda i=icp: i.align(dp2, dp1))
        results[name] = (np.asarray(pose), ms, f"rms={float(err):.3f} n={int(n)}")

    # joint robot-frame alignment from the RAW per-sensor images (no sphere
    # stitch; reference RegisterDensePhotoICP, RegisterRGBD360.h:344)
    from rgbd360_tpu.io.bin_format import read_rig_frame as _rd
    from rgbd360_tpu.core.frame import RigFrame
    from rgbd360_tpu.ops.stitch import rgb_to_gray
    from rgbd360_tpu.registration.rig_dense import RigDenseAligner, build_rig_pyramid

    rig_pyrs = []
    for path in (args.frame1, args.frame2):
        rig = builder.undistort(RigFrame.from_raw(_rd(path)))
        rig_pyrs.append(build_rig_pyramid(rgb_to_gray(rig.rgb), rig.depth, cfg))
    rig_al = RigDenseAligner(builder.k, builder.rt, cfg)
    res, ms = bench("rig_joint", lambda: rig_al.align(rig_pyrs[1], rig_pyrs[0]))
    results["rig_joint"] = (
        np.asarray(res.pose), ms, f"sso={float(res.sso):.2f} (raw sensors)"
    )

    print(f"{'method':<14} {'|t| m':<8} {'t':<30} {'ms':<8} notes")
    ref_t = results["dense_both"][0][:3, 3]
    for name, (pose, ms, note, *_) in results.items():
        t = pose[:3, 3]
        agree = np.linalg.norm(t - ref_t)
        print(
            f"{name:<14} {np.linalg.norm(t):<8.4f} "
            f"{np.round(t, 3).tolist()!s:<30} {ms:<8.1f} {note}  "
            f"(vs dense: {agree:.3f} m)"
        )
    return results


if __name__ == "__main__":
    main()
