"""Pinned real-data regression: every registration engine must agree on the
pose between the two bundled reference captures.

The reference publishes no trajectory, so the cross-engine consensus on
`samples/sphere_images_1.bin` <-> `sphere_images_10.bin` IS the accuracy
anchor (BASELINE.md): four independent estimators — PbMap closed-form from
matched planes, dense spherical photo+depth GN, joint rig-frame dense GN on
the raw 8-sensor images, and robust GICP — all land on the same ~0.32 m
translation.  This test pins that consensus with tolerances so any engine
drifting (a regression in segmentation, matching, warping, Jacobians, or the
ICP metric) fails loudly.

Pinned values measured 2026-08-20 (round 2) on the default config.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.ops import se3

S1 = "/root/reference/samples/sphere_images_1.bin"
S10 = "/root/reference/samples/sphere_images_10.bin"

# dense spherical PHOTO_DEPTH pose of frame 10 in frame 1 (T_1<-10)
PINNED_DENSE_T = np.array([-0.0016, 0.2268, 0.2191])


@pytest.fixture(scope="module")
def pair(calibration):
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame

    b = FrameBuilder(calibration)
    f1 = b.build_from_raw(read_rig_frame(S1))
    f10 = b.build_from_raw(read_rig_frame(S10))
    return b, f1, f10


def test_engines_agree_on_pinned_pose(pair, calibration):
    from rgbd360_tpu.core.frame import RigFrame
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.ops import stitch as stitch_ops
    from rgbd360_tpu.ops.pyramid import build_depth_pyramid
    from rgbd360_tpu.ops.stitch import rgb_to_gray
    from rgbd360_tpu.registration import dense as D
    from rgbd360_tpu.registration.icp import GICP, ICPAligner
    from rgbd360_tpu.registration.planes import PLANAR_3DOF, PlaneRegistration
    from rgbd360_tpu.registration.rig_dense import (
        RigDenseAligner,
        build_rig_pyramid,
    )

    b, f1, f10 = pair
    cfg = b.config.dense
    seam = stitch_ops.seam_mask_from_maps(b.maps, 1)
    p1 = D.build_frame_pyramid(f1.sphere_gray, f1.sphere_depth, cfg, seam)
    p10 = D.build_frame_pyramid(f10.sphere_gray, f10.sphere_depth, cfg, seam)

    # dense is the anchor: pinned absolute value
    dres = D.DenseAligner(cfg).align(p10, p1, method=D.PHOTO_DEPTH)
    t_dense = np.asarray(dres.pose)[:3, 3]
    assert np.linalg.norm(t_dense - PINNED_DENSE_T) < 0.005, t_dense
    ang = float(np.asarray(se3.rotation_angle(jnp.asarray(dres.pose)[:3, :3])))
    assert abs(ang) < 0.02, ang

    # PbMap closed-form from matched planes.  Full agreement is pinned on
    # the RAW-depth segmentation (rig.bilateral=False): with the default-on
    # bilateral filter (reference USE_BILATERAL_FILTER) more small ceiling
    # planes survive segmentation, two of them get wrongly associated
    # across this pair (no true counterparts exist — measured round 3), and
    # the leverage-aware solver then reports the affected translation
    # direction as unobservable instead of drifting — asserted below.
    import dataclasses as _dc

    from rgbd360_tpu.core.frame import FrameBuilder as _FB

    cfg_raw = b.config.replace(rig=_dc.replace(b.config.rig, bilateral=False))
    b_raw = _FB(calibration, cfg_raw)
    f1_raw = b_raw.build_from_raw(read_rig_frame(S1))
    f10_raw = b_raw.build_from_raw(read_rig_frame(S10))
    pb = PlaneRegistration(b.config.matcher).register(
        b_raw.segment_planes(f1_raw), b_raw.segment_planes(f10_raw),
        mode=PLANAR_3DOF,
    )
    assert bool(pb.success) and int(pb.n_matches) >= 5
    t_pb = np.asarray(pb.pose)[:3, 3]
    assert np.linalg.norm(t_pb - t_dense) < 0.02, t_pb

    # with bilateral ON (the default build f1/f10): the solver must flag the
    # under-constrained translation direction (small info eigenvalue) and
    # stay honest (near-zero, not dragged) there, while the well-observed
    # x direction still agrees with dense
    pb_bil = PlaneRegistration(b.config.matcher).register(
        b.segment_planes(f1), b.segment_planes(f10), mode=PLANAR_3DOF
    )
    info_eigs = np.linalg.eigvalsh(np.asarray(pb_bil.information)[:3, :3])
    t_bil = np.asarray(pb_bil.pose)[:3, 3]
    assert info_eigs[0] < 0.25, info_eigs  # deficiency reported
    assert abs(t_bil[0] - t_dense[0]) < 0.05, t_bil
    assert np.linalg.norm(t_bil) < 0.15, t_bil  # honest, not dragged

    # robust GICP (plane-to-plane) from both identity and the PbMap seed
    d1 = tuple(build_depth_pyramid(f1.sphere_depth, 4))
    d10 = tuple(build_depth_pyramid(f10.sphere_depth, 4))
    gicp = ICPAligner(cfg, variant=GICP)
    for seed in (jnp.eye(4), jnp.asarray(pb.pose)):
        pose_g, _, _, n_g = gicp.align(d10, d1, seed)
        t_g = np.asarray(pose_g)[:3, 3]
        assert np.linalg.norm(t_g - t_dense) < 0.01, t_g
        assert int(n_g) > 1e5

    # joint rig-frame dense GN on the raw 8-sensor images (no sphere stitch)
    rig_pyrs = []
    for path in (S1, S10):
        rig = b.undistort(RigFrame.from_raw(read_rig_frame(path)))
        rig_pyrs.append(build_rig_pyramid(rgb_to_gray(rig.rgb), rig.depth, cfg))
    rres = RigDenseAligner(b.k, b.rt, cfg).align(rig_pyrs[1], rig_pyrs[0])
    t_rig = np.asarray(rres.pose)[:3, 3]
    assert np.linalg.norm(t_rig - t_dense) < 0.03, t_rig
