"""Plane segmentation + plane-based registration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.config import MatcherConfig, SegmentationConfig
from rgbd360_tpu.ops import camera, se3
from rgbd360_tpu.ops.segmentation import (
    PlaneSet,
    estimate_normals,
    merge_plane_sets,
    segment_planes_sensor,
    transform_planes,
)
from rgbd360_tpu.registration.planes import (
    PLANAR_3DOF,
    ODOMETRY_6DOF,
    PlaneRegistration,
    match_planes,
    pose_from_matches,
)


def _box_scene(h=120, w=160, fx=131.25, fy=131.25):
    """Organized cloud of a room corner: floor + two walls."""
    cx, cy = (w - 1) / 2, (h - 1) / 2
    u = np.arange(w)[None, :].repeat(h, 0)
    v = np.arange(h)[:, None].repeat(w, 1)
    xn = (u - cx) / fx
    yn = (v - cy) / fy
    # rays (xn, yn, 1); intersect with 3 planes, take nearest positive depth.
    # Sized to the ~31 deg half-FOV: wall z = 3; side wall x = 1.2
    # (visible where xn > 0.4); floor y = 0.8 (visible where yn > 0.27).
    z_wall = np.full((h, w), 3.0)
    with np.errstate(divide="ignore"):
        z_side = np.where(xn > 1e-6, 1.2 / np.maximum(xn, 1e-6), np.inf)
        z_floor = np.where(yn > 1e-6, 0.8 / np.maximum(yn, 1e-6), np.inf)
    z = np.minimum(np.minimum(z_wall, z_side), z_floor)
    xyz = np.stack([xn * z, yn * z, z], axis=-1).astype(np.float32)
    valid = np.isfinite(z) & (z < 10)
    rgb = np.full((h, w, 3), 128.0, np.float32)
    return jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(valid)


class TestNormals:
    def test_flat_wall(self):
        xyz, _, valid = _box_scene()
        n = estimate_normals(xyz, valid)
        # center region looks at wall z=3 -> normal ~ (0, 0, -1) (toward cam)
        center = np.asarray(n[40:60, 40:70])
        assert np.abs(center[..., 2] + 1).mean() < 0.05, center.mean(axis=(0, 1))


class TestSegmentation:
    def test_box_scene(self):
        xyz, rgb, valid = _box_scene()
        cfg = SegmentationConfig(min_area=0.1)
        ps = segment_planes_sensor(xyz, rgb, valid, cfg)
        got = int(np.sum(np.asarray(ps.valid)))
        assert got >= 3, f"found {got} planes"
        normals = np.asarray(ps.normal)[np.asarray(ps.valid)]
        # expected normals (toward viewpoint): (0,0,-1), (-1,0,0), (0,-1,0)
        expected = np.array([[0, 0, -1], [-1, 0, 0], [0, -1, 0]])
        for e in expected:
            dots = normals @ e
            assert dots.max() > 0.98, f"missing plane with normal {e}: {normals}"

    def test_plane_distances(self):
        xyz, rgb, valid = _box_scene()
        ps = segment_planes_sensor(xyz, rgb, valid, SegmentationConfig(min_area=0.1))
        nv = np.asarray(ps.valid)
        normals = np.asarray(ps.normal)[nv]
        ds = np.asarray(ps.d)[nv]
        # wall z=3: n=(0,0,-1), d = -n.c = 3; x=1.2 wall: d=1.2; floor: d=0.8
        for n_exp, d_exp in [([0, 0, -1], 3.0), ([-1, 0, 0], 1.2), ([0, -1, 0], 0.8)]:
            k = np.argmax(normals @ np.array(n_exp))
            assert abs(ds[k] - d_exp) < 0.05, (normals[k], ds[k], d_exp)

    def test_transform_planes(self):
        xyz, rgb, valid = _box_scene()
        ps = segment_planes_sensor(xyz, rgb, valid, SegmentationConfig(min_area=0.1))
        rt = se3.se3_exp(jnp.array([0.5, -0.2, 0.1, 0.2, -0.1, 0.3]))
        tps = transform_planes(ps, rt)
        # plane equation still holds for transformed centers
        resid = np.asarray(
            jnp.sum(tps.normal * tps.center, axis=-1) + tps.d
        )[np.asarray(tps.valid)]
        assert np.abs(resid).max() < 1e-4
        # hull points stay on the plane
        hp = np.asarray(
            jnp.einsum("kri,ki->kr", tps.hull, tps.normal) + tps.d[:, None]
        )[np.asarray(tps.valid)]
        assert np.abs(hp).max() < 0.1

    def test_merge_duplicates(self):
        xyz, rgb, valid = _box_scene()
        cfg = SegmentationConfig(min_area=0.1)
        ps = segment_planes_sensor(xyz, rgb, valid, cfg)
        n_before = int(np.sum(np.asarray(ps.valid)))
        merged = merge_plane_sets([ps, ps], cfg)
        n_after = int(np.sum(np.asarray(merged.valid)))
        assert n_after == n_before, (n_before, n_after)


class TestMatching:
    def _two_sets(self, motion_xi, seed=0):
        rng = np.random.default_rng(seed)
        k = 8
        normals = rng.normal(size=(k, 3))
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        centers = rng.uniform(-3, 3, (k, 3)).astype(np.float32)
        d = -np.sum(normals * centers, axis=1)
        area = rng.uniform(0.5, 3.0, k).astype(np.float32)
        hull = centers[:, None, :] + rng.normal(0, 0.2, (k, 16, 3))
        hist = np.abs(rng.normal(size=(k, 37))).astype(np.float32)
        hist /= hist.sum(1, keepdims=True)
        cap = 32

        def pad(a, fill=0.0):
            out = np.full((cap,) + a.shape[1:], fill, a.dtype)
            out[:k] = a
            return jnp.asarray(out)

        ref = PlaneSet(
            normal=pad(normals.astype(np.float32)),
            center=pad(centers),
            d=pad(d.astype(np.float32)),
            curvature=pad(np.full(k, 1e-4, np.float32)),
            area=pad(area),
            elongation=pad(np.full(k, 1.5, np.float32)),
            n_inliers=pad(np.full(k, 500.0, np.float32)),
            hull=pad(hull.astype(np.float32)),
            hue_hist=pad(hist),
            main_color=pad(np.full((k, 3), 0.5, np.float32)),
            valid=pad(np.ones(k, bool), False),
        )
        t = se3.se3_exp(jnp.asarray(motion_xi, jnp.float32))
        # target set observes the same planes from a moved frame:
        # x_ref = T x_trg -> plane in trg frame: n2 = R^T n1, d2 = d1 + n1.t
        r = np.asarray(t)[:3, :3]
        tt = np.asarray(t)[:3, 3]
        n2 = normals @ r
        d2 = d + normals @ tt
        c2 = (centers - tt) @ r
        trg = PlaneSet(
            normal=pad(n2.astype(np.float32)),
            center=pad(c2.astype(np.float32)),
            d=pad(d2.astype(np.float32)),
            curvature=ref.curvature,
            area=ref.area,
            elongation=ref.elongation,
            n_inliers=ref.n_inliers,
            hull=pad(((hull - tt) @ r).astype(np.float32)),
            hue_hist=ref.hue_hist,
            main_color=ref.main_color,
            valid=ref.valid,
        )
        return ref, trg, t

    def test_match_identity(self):
        ref, trg, _ = self._two_sets([0, 0, 0, 0, 0, 0])
        cfg = MatcherConfig()
        pairs, n = match_planes(ref, trg, cfg, ODOMETRY_6DOF)
        n = int(n)
        assert n >= 6, n
        p = np.asarray(pairs)[:n]
        assert (p[:, 0] == p[:, 1]).all(), p  # identity correspondence

    def test_pose_recovery(self):
        xi = [0.3, -0.2, 0.15, 0.1, -0.05, 0.2]
        ref, trg, t_true = self._two_sets(xi)
        cfg = MatcherConfig()
        reg = PlaneRegistration(cfg)
        res = reg.register(ref, trg, mode=ODOMETRY_6DOF)
        assert bool(res.success)
        err = np.asarray(se3.se3_log(se3.se3_inverse(res.pose) @ t_true))
        assert np.linalg.norm(err) < 0.02, (np.asarray(res.pose), np.asarray(t_true))

    def test_information_psd(self):
        ref, trg, _ = self._two_sets([0.1, 0, 0.1, 0, 0.05, 0])
        res = PlaneRegistration().register(ref, trg, mode=ODOMETRY_6DOF)
        info = np.asarray(res.information)
        np.testing.assert_allclose(info, info.T, atol=1e-3)
        assert np.linalg.eigvalsh(info).min() > -1e-3

    def test_too_few_planes_fails(self):
        ref, trg, _ = self._two_sets([0, 0, 0, 0, 0, 0])
        # invalidate all but 2 planes
        mask = np.zeros(32, bool)
        mask[:2] = True
        ref2 = jax.tree_util.tree_map(lambda a: a, ref)
        object.__setattr__(ref2, "valid", jnp.asarray(mask))
        res = PlaneRegistration().register(ref2, trg, mode=ODOMETRY_6DOF)
        assert not bool(res.success)


class TestRealFrames:
    @pytest.fixture(scope="class")
    def frames(self, calibration, sample_paths):
        import dataclasses

        from rgbd360_tpu.config import default_config
        from rgbd360_tpu.core.frame import FrameBuilder
        from rgbd360_tpu.io.bin_format import read_rig_frame

        # raw-depth segmentation: with the default-on bilateral filter this
        # pair's extra small ceiling planes associate wrongly (no true
        # counterparts), and the PbMap translation honestly degrades to the
        # observable subspace — pinned in tests/test_real_pair.py.  The full
        # cross-frame agreement regression here uses the raw configuration.
        cfg = default_config()
        cfg = cfg.replace(rig=dataclasses.replace(cfg.rig, bilateral=False))
        b = FrameBuilder(calibration, cfg)
        out = []
        for p in sample_paths[:2]:
            f = b.build_from_raw(read_rig_frame(p))
            out.append((f, b.segment_planes(f)))
        return out

    def test_segment_real(self, frames):
        for f, ps in frames:
            n = int(np.sum(np.asarray(ps.valid)))
            assert n >= 5, f"only {n} planes found"
            normals = np.asarray(ps.normal)[np.asarray(ps.valid)]
            np.testing.assert_allclose(
                np.linalg.norm(normals, axis=1), 1.0, atol=1e-3
            )
            areas = np.asarray(ps.area)[np.asarray(ps.valid)]
            assert areas.max() > 1.0  # a room has at least one big plane

    def test_register_real(self, frames):
        (f1, ps1), (f2, ps2) = frames
        res = PlaneRegistration().register(ps1, ps2, mode=PLANAR_3DOF)
        assert bool(res.success), int(res.n_matches)
        t = np.asarray(res.pose)
        dt = np.linalg.norm(t[:3, 3])
        # must roughly agree with the dense result (|t| ~ 0.32 m)
        assert 0.1 < dt < 0.8, t[:3, 3]


def test_segment_planes_batch_matches_single(calibration, sample_paths):
    """segment_planes_batch (vmapped over a frame batch) must reproduce the
    per-frame segmentation exactly."""
    import jax

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame

    b = FrameBuilder(calibration)
    frames = [b.build_from_raw(read_rig_frame(p)) for p in sample_paths[:2]]
    singles = [b.segment_planes(f) for f in frames]
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), frames[0], frames[1]
    )
    batched = b.segment_planes_batch(batch)
    for i, single in enumerate(singles):
        one = jax.tree_util.tree_map(lambda a: a[i], batched)
        for name in ("normal", "center", "d", "area", "valid"):
            np.testing.assert_allclose(
                np.asarray(getattr(one, name)),
                np.asarray(getattr(single, name)),
                atol=1e-5,
                err_msg=f"frame {i} field {name}",
            )


def test_box_blur_matches_cumsum_reference(rng):
    """The banded-matmul box blur must reproduce the former cumsum-of-
    edge-padded formulation EXACTLY (incl. its truncated, unrenormalized
    border windows): border weighting is part of the validated normal-
    estimation behavior — a 'corrected' clamped window shifted border
    normals enough to break half-res plane matching in the soak (round 3)."""
    from rgbd360_tpu.ops.segmentation import _box_blur

    def old_box_blur(x, k):
        def blur_axis(a, axis):
            n = a.shape[axis]
            c = jnp.cumsum(a, axis=axis)
            pad = [(0, 0)] * a.ndim
            pad[axis] = (k // 2 + 1, k - k // 2 - 1)
            c = jnp.pad(c, pad, mode="edge")
            hi = jax.lax.slice_in_dim(c, k, k + n, axis=axis)
            lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
            return (hi - lo) / k

        return blur_axis(blur_axis(x, -2), -1)

    for shape, k in (((4, 40, 24), 8), ((33, 57), 8), ((16, 20), 5)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_box_blur(x, k)), np.asarray(old_box_blur(x, k)),
            atol=1e-5,
        )
