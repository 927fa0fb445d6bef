"""Pinhole dense alignment + robot-frame multi-sensor joint alignment tests.

Covers the reference's pinhole `RegisterPhotoICP` path (`errorPhotoICP:560`,
`calcHessGrad:776`, `alignFrames:4254`) and `RegisterDensePhotoICP`
(`RegisterRGBD360.h:344`) equivalents with exact analytic synthetic scenes:
a textured room corner (3 planes) rendered through the true pinhole model, so
source/target pairs are geometrically consistent to machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import se3
from rgbd360_tpu.registration.dense import (
    DEPTH_CONSISTENCY,
    PHOTO_DEPTH,
    DenseAligner,
    build_frame_pyramid,
    scale_intrinsics,
)
from rgbd360_tpu.registration.rig_dense import RigDenseAligner, build_rig_pyramid

H, W = 120, 160
K = jnp.array([[130.0, 0.0, 79.5], [0.0, 130.0, 59.5], [0.0, 0.0, 1.0]])

# Room corner: four planes n.p = d in world coordinates, all facing the
# origin, ~2.5-4 m away (wall, side wall, floor, ceiling — the floor+ceiling
# pair keeps depth-only translation observable in every direction).
_PLANES = np.array(
    [
        [0.0, 0.0, 1.0, 3.2],
        [0.9, 0.1, 0.42, 2.8],
        [-0.15, 0.95, 0.28, 3.6],
        [0.1, -0.95, 0.3, 2.4],
    ],
    dtype=np.float32,
)
_PLANES[:, :3] /= np.linalg.norm(_PLANES[:, :3], axis=1, keepdims=True)


def _render_pinhole(pose_wc, k=K, h=H, w=W):
    """Exact RGB-D render of the corner scene from camera-to-world pose."""
    u = (jnp.arange(w) - k[0, 2]) / k[0, 0]
    v = (jnp.arange(h) - k[1, 2]) / k[1, 1]
    ray_c = jnp.stack(
        [jnp.broadcast_to(u[None, :], (h, w)), jnp.broadcast_to(v[:, None], (h, w)),
         jnp.ones((h, w))],
        axis=-1,
    )
    r = pose_wc[:3, :3]
    t = pose_wc[:3, 3]
    ray_w = ray_c @ r.T  # (h, w, 3)
    # z-depth of the intersection with each plane; keep the nearest positive
    n = jnp.asarray(_PLANES[:, :3])
    d = jnp.asarray(_PLANES[:, 3])
    denom = jnp.einsum("hwk,pk->hwp", ray_w, n)
    z = (d[None, None, :] - jnp.einsum("k,pk->p", t, n)[None, None, :]) / jnp.where(
        jnp.abs(denom) > 1e-6, denom, 1e-6
    )
    z = jnp.where(z > 0.1, z, jnp.inf)
    depth = jnp.min(z, axis=-1)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    p_w = t + ray_w * depth[..., None]
    gray = (
        0.5
        + 0.18 * jnp.sin(2.1 * p_w[..., 0])
        + 0.14 * jnp.cos(1.7 * p_w[..., 1] + 0.6)
        + 0.12 * jnp.sin(1.3 * p_w[..., 2] + 1.1)
    )
    gray = jnp.where(depth > 0, gray, 0.0)
    return gray.astype(jnp.float32), depth.astype(jnp.float32)


@pytest.fixture(scope="module")
def cfg():
    return DenseRegConfig(pyramid_levels=3, sal_intensity=0.0, sal_depth=0.0)


def test_se3_adjoint_identity():
    xi = jnp.array([0.2, -0.1, 0.3, 0.15, -0.22, 0.08])
    t = se3.se3_exp(jnp.array([0.5, 1.0, -0.7, 0.4, 0.3, -0.5]))
    lhs = se3.se3_exp(se3.adjoint(t) @ xi)
    rhs = t @ se3.se3_exp(xi) @ se3.se3_inverse(t)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_scale_intrinsics():
    k1 = scale_intrinsics(K, 1)
    np.testing.assert_allclose(np.asarray(k1[0, 0]), 65.0)
    np.testing.assert_allclose(np.asarray(k1[1, 2]), 59.5 / 2)


def test_pinhole_identity(cfg):
    gray, depth = _render_pinhole(jnp.eye(4))
    pyr = build_frame_pyramid(gray, depth, cfg, spherical=False)
    res = DenseAligner(cfg, intrinsics=K).align(pyr, pyr, method=PHOTO_DEPTH)
    np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-3)
    assert float(res.sso) > 0.9
    assert not bool(res.ill_posed)


def test_pinhole_recover_known_pose(cfg):
    true_xi = jnp.array([0.05, -0.04, 0.06, 0.012, -0.018, 0.02])
    cam2_wc = se3.se3_exp(true_xi)  # target camera pose in world
    gray1, depth1 = _render_pinhole(jnp.eye(4))
    gray2, depth2 = _render_pinhole(cam2_wc)
    src = build_frame_pyramid(gray1, depth1, cfg, spherical=False)
    trg = build_frame_pyramid(gray2, depth2, cfg, spherical=False)
    res = DenseAligner(cfg, intrinsics=K).align(src, trg, method=PHOTO_DEPTH)
    # res.pose maps source-camera points into the target camera frame,
    # so it should equal inv(cam2_wc).
    err = se3.se3_log(res.pose @ cam2_wc)
    assert float(jnp.linalg.norm(err[:3])) < 0.01, np.asarray(err)
    assert float(jnp.linalg.norm(err[3:])) < 0.005, np.asarray(err)
    assert not bool(res.ill_posed)


def test_pinhole_depth_only(cfg):
    true_pose = se3.se3_exp(jnp.array([0.04, 0.02, -0.03, 0.015, 0.0, -0.01]))
    gray1, depth1 = _render_pinhole(jnp.eye(4))
    gray2, depth2 = _render_pinhole(true_pose)
    src = build_frame_pyramid(gray1, depth1, cfg, spherical=False)
    trg = build_frame_pyramid(gray2, depth2, cfg, spherical=False)
    res = DenseAligner(cfg, intrinsics=K).align(src, trg, method=DEPTH_CONSISTENCY)
    err = se3.se3_log(res.pose @ true_pose)
    assert float(jnp.linalg.norm(err)) < 0.03, np.asarray(err)


def test_pinhole_occlusion_modes(cfg):
    gray, depth = _render_pinhole(jnp.eye(4))
    pyr = build_frame_pyramid(gray, depth, cfg, spherical=False)
    aligner = DenseAligner(cfg, intrinsics=K)
    for occ in (1, 2):
        res = aligner.align(pyr, pyr, method=PHOTO_DEPTH, occlusion=occ)
        np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-3)


# ------------------------------------------------------------- rig (joint)


def _rig_extrinsics():
    """Two sensors looking 50 degrees apart about the rig's vertical (y) axis,
    mounted 5.5 cm off-center like the reference rig
    (`Calibrator::loadConstructionSpecs`, `include/Calibrator.h:763`)."""
    rts = []
    for ang in (0.0, np.deg2rad(50.0)):
        r = se3.so3_exp(jnp.array([0.0, ang, 0.0]))
        rt = jnp.eye(4).at[:3, :3].set(r)
        rt = rt.at[:3, 3].set(r @ jnp.array([0.0, 0.0, -0.055]))
        rts.append(rt)
    return jnp.stack(rts)


def _render_rig(robot_pose, rts):
    grays, depths = [], []
    for i in range(rts.shape[0]):
        g, d = _render_pinhole(robot_pose @ rts[i])
        grays.append(g)
        depths.append(d)
    return jnp.stack(grays), jnp.stack(depths)


def test_rig_joint_identity(cfg):
    rts = _rig_extrinsics()
    grays, depths = _render_rig(jnp.eye(4), rts)
    pyr = build_rig_pyramid(grays, depths, cfg)
    res = RigDenseAligner(K, rts, cfg).align(pyr, pyr)
    np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-3)
    assert not bool(res.ill_posed)


def test_rig_joint_recover_robot_motion(cfg):
    """The shared robot pose must be recovered jointly from both sensors."""
    rts = _rig_extrinsics()
    true_xi = jnp.array([0.05, -0.03, 0.04, 0.01, 0.025, -0.015])
    robot2 = se3.se3_exp(true_xi)
    g1, d1 = _render_rig(jnp.eye(4), rts)
    g2, d2 = _render_rig(robot2, rts)
    src = build_rig_pyramid(g1, d1, cfg)
    trg = build_rig_pyramid(g2, d2, cfg)
    res = RigDenseAligner(K, rts, cfg).align(src, trg, method=PHOTO_DEPTH)
    err = se3.se3_log(res.pose @ robot2)
    assert float(jnp.linalg.norm(err[:3])) < 0.015, np.asarray(err)
    assert float(jnp.linalg.norm(err[3:])) < 0.008, np.asarray(err)
    # joint information matrix: symmetric PSD
    h = np.asarray(res.hessian)
    np.testing.assert_allclose(h, h.T, rtol=1e-4)
    assert np.linalg.eigvalsh(h).min() > 0


def test_rig_joint_beats_single_sensor_conditioning(cfg):
    """A single camera observing mostly one plane is weakly constrained in
    some directions; adding the second sensor must strictly increase the
    information (H_joint - H_single PSD up to numerics)."""
    rts = _rig_extrinsics()
    g1, d1 = _render_rig(jnp.eye(4), rts)
    src = build_rig_pyramid(g1, d1, cfg)
    joint = RigDenseAligner(K, rts, cfg).align(src, src)
    single = RigDenseAligner(K, rts[:1], cfg).align(
        jax.tree.map(lambda a: a[:1], src), jax.tree.map(lambda a: a[:1], src)
    )
    dh = np.asarray(joint.hessian - single.hessian)
    assert np.linalg.eigvalsh((dh + dh.T) / 2).min() > -1e-3
