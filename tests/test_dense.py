"""Dense spherical alignment tests: synthetic pose recovery + real samples."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.config import DenseRegConfig
from rgbd360_tpu.ops import camera, se3
from rgbd360_tpu.registration.dense import (
    DEPTH_CONSISTENCY,
    PHOTO_DEPTH,
    DenseAligner,
    FramePyramid,
    build_frame_pyramid,
    entropy_from_hessian,
)


def _make_synthetic_sphere(h=80, w=480, seed=0):
    """A smooth synthetic spherical scene: a textured room-like radial field."""
    rng = np.random.default_rng(seed)
    phi, theta = np.meshgrid(
        (0.5 * h - 0.5 - np.arange(h)) * (2 * np.pi / w),
        np.arange(w) * (2 * np.pi / w),
        indexing="ij",
    )
    # depth: smooth low-frequency room (sum of a few harmonics), 2-4 m
    depth = 3.0 + 0.5 * np.sin(2 * theta) + 0.3 * np.cos(3 * theta + 1.0) + 0.4 * np.sin(
        2 * phi + 0.5
    )
    # gray: smooth texture correlated with geometry + extra detail
    gray = 0.5 + 0.2 * np.sin(5 * theta + phi) + 0.15 * np.cos(9 * theta) + 0.1 * np.sin(
        7 * phi
    )
    return jnp.asarray(gray, jnp.float32), jnp.asarray(depth, jnp.float32)


def _render_from(gray, depth, pose):
    """Render the scene seen from `pose` (inverse warp by nearest lookup).

    For each pixel of the new view, find the 3D point along its ray such that
    it matches the source surface — approximate by projecting source points
    into the new view (forward splat via nearest pixel)."""
    h, w = gray.shape
    pts = camera.sphere_backproject(depth)
    tp = se3.transform_points(se3.se3_inverse(pose), pts.reshape(-1, 3))
    rc, rho = camera.sphere_project(tp, h, w)
    r = jnp.clip(jnp.round(rc[:, 0]).astype(int), 0, h - 1)
    c = jnp.round(rc[:, 1]).astype(int) % w
    new_gray = jnp.zeros((h, w)).at[r, c].set(gray.reshape(-1))
    new_depth = jnp.zeros((h, w)).at[r, c].set(rho)
    # fill holes with 3x3 max of neighbors (cheap inpaint for test purposes)
    def fill(img):
        stacked = jnp.stack(
            [jnp.roll(img, (dr, dc), (0, 1)) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
        )
        nz = jnp.where(stacked != 0, stacked, jnp.nan)
        med = jnp.nanmean(nz, axis=0)
        return jnp.where(img != 0, img, jnp.nan_to_num(med))

    return fill(new_gray), fill(new_depth)


@pytest.fixture(scope="module")
def cfg():
    return DenseRegConfig(pyramid_levels=3, sal_intensity=0.0, sal_depth=0.0)


def test_identity_alignment(cfg):
    gray, depth = _make_synthetic_sphere()
    pyr = build_frame_pyramid(gray, depth, cfg)
    aligner = DenseAligner(cfg)
    res = aligner.align(pyr, pyr, method=PHOTO_DEPTH)
    np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-3)
    assert float(res.sso) > 0.95
    assert not bool(res.ill_posed)


def test_recover_known_pose(cfg):
    gray, depth = _make_synthetic_sphere()
    true_xi = jnp.array([0.06, -0.04, 0.05, 0.015, -0.02, 0.025])
    true_pose = se3.se3_exp(true_xi)
    # target = scene observed from true_pose
    gray2, depth2 = _render_from(gray, depth, true_pose)

    src = build_frame_pyramid(gray, depth, cfg)
    trg = build_frame_pyramid(gray2, depth2, cfg)
    aligner = DenseAligner(cfg)
    res = aligner.align(src, trg, method=PHOTO_DEPTH)

    # res.pose should map source points to target-frame points: T ~ inv(true)
    err = se3.se3_log(res.pose @ true_pose)
    assert float(jnp.linalg.norm(err[:3])) < 0.02, np.asarray(err)
    assert float(jnp.linalg.norm(err[3:])) < 0.01, np.asarray(err)


def test_depth_only_alignment(cfg):
    gray, depth = _make_synthetic_sphere(seed=3)
    true_pose = se3.se3_exp(jnp.array([0.05, 0.0, -0.03, 0.0, 0.015, 0.0]))
    gray2, depth2 = _render_from(gray, depth, true_pose)
    src = build_frame_pyramid(gray, depth, cfg)
    trg = build_frame_pyramid(gray2, depth2, cfg)
    res = DenseAligner(cfg).align(src, trg, method=DEPTH_CONSISTENCY)
    err = se3.se3_log(res.pose @ true_pose)
    assert float(jnp.linalg.norm(err)) < 0.05, np.asarray(err)


def test_hessian_is_information(cfg):
    gray, depth = _make_synthetic_sphere()
    pyr = build_frame_pyramid(gray, depth, cfg)
    res = DenseAligner(cfg).align(pyr, pyr, method=PHOTO_DEPTH)
    h = np.asarray(res.hessian)
    np.testing.assert_allclose(h, h.T, rtol=1e-5)
    eig = np.linalg.eigvalsh(h)
    assert eig.min() > 0, eig  # observable, PSD
    ent = float(entropy_from_hessian(res.hessian))
    assert np.isfinite(ent)


def test_real_samples_alignment(calibration, sample_paths):
    """End-to-end minimum slice: dense odometry between the two samples."""
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.ops import stitch as stitch_ops

    builder = FrameBuilder(calibration)
    cfg = DenseRegConfig()
    seam_valid = stitch_ops.seam_mask_from_maps(builder.maps, half_width=1)

    pyrs = []
    for p in sample_paths[:2]:
        f = builder.build_from_raw(read_rig_frame(p))
        pyrs.append(
            build_frame_pyramid(f.sphere_gray, f.sphere_depth, cfg, seam_valid)
        )

    aligner = DenseAligner(cfg)
    res = aligner.align(pyrs[0], pyrs[1], method=PHOTO_DEPTH)
    t = np.asarray(res.pose)
    dt = np.linalg.norm(t[:3, 3])
    dr = float(se3.rotation_angle(jnp.asarray(t[:3, :3])))
    # Frames 1 and 10 of a hand-held indoor walk: expect a modest motion.
    assert not bool(res.ill_posed)
    assert 0.05 < dt < 1.5, f"translation {dt}"
    assert dr < 0.6, f"rotation {dr}"
    assert float(res.sso) > 0.5
    assert float(res.av_depth_residual) < 3.0

    # Cross-check: depth-only alignment must agree with photo+depth to cm
    # level — two independent cost functions converging to the same motion.
    res_d = aligner.align(pyrs[0], pyrs[1], method=DEPTH_CONSISTENCY)
    dpose = np.asarray(se3.se3_log(se3.se3_inverse(res.pose) @ res_d.pose))
    assert np.linalg.norm(dpose[:3]) < 0.05, dpose
    assert np.linalg.norm(dpose[3:]) < 0.03, dpose


# ---------------------------------------------------------- bilinear target

def _box_room_sphere(h, w, origin, half_extents=(3.0, 1.4, 4.0)):
    """Exact spherical depth + world-locked texture of an axis-aligned box
    room seen from `origin` — geometrically consistent across viewpoints
    with NO splat/render noise, so pairwise pose error isolates the target
    sampling model (nearest vs validity-weighted bilinear)."""
    rows, cols = np.arange(h), np.arange(w)
    phi = (h / 2 - 0.5 - rows) * (2 * np.pi / w)
    theta = cols * (2 * np.pi / w)
    sp, cp = np.sin(phi)[:, None], np.cos(phi)[:, None]
    st, ct = np.sin(theta)[None, :], np.cos(theta)[None, :]
    v = np.stack([np.broadcast_to(sp, (h, w)), -cp * st, -cp * ct], axis=-1)
    t_best = np.full((h, w), np.inf)
    for ax in range(3):
        for sign in (-1.0, 1.0):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (sign * half_extents[ax] - origin[ax]) / v[..., ax]
            t_best = np.minimum(
                t_best, np.where((t > 1e-3) & np.isfinite(t), t, np.inf)
            )
    hit = origin[None, None, :] + t_best[..., None] * v
    gray = (
        0.5
        + 0.2 * np.sin(2.7 * hit[..., 0])
        + 0.18 * np.cos(3.1 * hit[..., 1] + 1.0)
        + 0.15 * np.sin(2.3 * hit[..., 2] + 0.5)
    )
    return jnp.asarray(gray, jnp.float32), jnp.asarray(t_best, jnp.float32)


def test_bilinear_identity_matches_nearest():
    """At an exact integer warp (identity self-alignment) the
    validity-weighted bilinear sampler must reduce to the nearest sampler:
    all blend weight sits on tap (0, 0)."""
    from dataclasses import replace

    gray, depth = _make_synthetic_sphere(h=48, w=288)
    base = DenseRegConfig(pyramid_levels=2, sal_intensity=0.0, sal_depth=0.0)
    poses = {}
    for bil in (False, True):
        cfg = replace(base, bilinear=bil)
        pyr = build_frame_pyramid(gray, depth, cfg)
        res = DenseAligner(cfg).align(pyr, pyr, method=PHOTO_DEPTH)
        assert not bool(res.ill_posed)
        np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-3)
        poses[bil] = np.asarray(res.pose)
    np.testing.assert_allclose(poses[True], poses[False], atol=1e-5)


def test_bilinear_beats_nearest_on_exact_geometry():
    """Validity-weighted bilinear target sampling must (a) reduce the
    pairwise pose error vs nearest rounding, and (b) keep the depth-residual
    statistic HEALTHY — the naive full-lerp implementation blended across
    invalid pixels and depth discontinuities and inflated it ~10x
    (docs/PERFORMANCE.md), which would break every residual-gated policy
    (KF selection, LC verification, loss detection)."""
    from dataclasses import replace

    origin0 = np.array([0.0, 0.0, 0.0])
    origin1 = np.array([0.06, 0.01, 0.04])
    g0, d0 = _box_room_sphere(80, 480, origin0)
    g1, d1 = _box_room_sphere(80, 480, origin1)
    base = DenseRegConfig(pyramid_levels=3)
    err, avd = {}, {}
    for bil in (False, True):
        cfg = replace(base, bilinear=bil)
        p0 = build_frame_pyramid(g0, d0, cfg)
        p1 = build_frame_pyramid(g1, d1, cfg)
        res = DenseAligner(cfg).align(p0, p1, method=PHOTO_DEPTH)
        assert not bool(res.ill_posed)
        t = np.asarray(res.pose)[:3, 3]
        # camera 1 sees camera 0's scene shifted by -(origin1 - origin0)
        err[bil] = np.linalg.norm(t + (origin1 - origin0))
        avd[bil] = float(res.av_depth_residual)
    assert err[True] < err[False], (err, avd)
    assert err[True] < 0.002, (err, avd)
    assert avd[True] < avd[False], avd


def test_pyramid_tail_levels():
    """`pyramid_tail` drops the finest levels so a fewer-level aligner can
    run at coarse resolution (the keyframe event's connection aligns)."""
    import jax.numpy as jnp

    from rgbd360_tpu.config import DenseRegConfig
    from rgbd360_tpu.registration import dense as D

    cfg = DenseRegConfig(pyramid_levels=3)
    g = jnp.ones((64, 128))
    d = jnp.full((64, 128), 2.0)
    pyr = D.build_frame_pyramid(g, d, cfg)
    tail = D.pyramid_tail(pyr, 1)
    assert len(tail.gray) == 2
    assert tail.gray[0].shape == (32, 64)
    assert tail.depth[1].shape == (16, 32)
    # start=0 is the identity
    same = D.pyramid_tail(pyr, 0)
    assert same.gray[0].shape == pyr.gray[0].shape
