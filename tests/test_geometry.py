"""Geometry unit tests: SE3 group ops, camera models, round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import camera, se3


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(0, 0.5, (32, 6)), dtype=jnp.float32)
        t = se3.se3_exp(xi)
        xi2 = se3.se3_log(t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.array([1e-9, 0, 0, 0, 1e-9, 0], dtype=jnp.float32)
        t = se3.se3_exp(xi)
        np.testing.assert_allclose(t, np.eye(4), atol=1e-6)

    def test_exp_identity(self):
        t = se3.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(t, np.eye(4), atol=1e-7)

    def test_inverse(self, rng):
        xi = jnp.asarray(rng.normal(0, 0.5, (8, 6)), dtype=jnp.float32)
        t = se3.se3_exp(xi)
        ti = se3.se3_inverse(t)
        prod = jnp.einsum("nij,njk->nik", t, ti)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
        )

    def test_rotation_is_orthonormal(self, rng):
        xi = jnp.asarray(rng.normal(0, 2.0, (16, 6)), dtype=jnp.float32)
        r = se3.se3_exp(xi)[:, :3, :3]
        rrt = jnp.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(
            rrt, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(r), np.ones(16), atol=1e-5)

    def test_transform_points(self, rng):
        t = se3.se3_exp(jnp.asarray(rng.normal(0, 0.3, 6), dtype=jnp.float32))
        pts = jnp.asarray(rng.normal(0, 2, (100, 3)), dtype=jnp.float32)
        out = se3.transform_points(t, pts)
        expect = (np.asarray(t)[:3, :3] @ np.asarray(pts).T).T + np.asarray(t)[:3, 3]
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_pose_distance(self):
        a = jnp.eye(4)
        b = se3.se3_exp(jnp.array([1.0, 0, 0, 0, 0, 0.5]))
        dt, dr = se3.pose_distance(a, b)
        assert abs(float(dr) - 0.5) < 1e-5
        assert float(dt) > 0.5


class TestCamera:
    def test_pinhole_roundtrip(self, rng):
        k = jnp.array([[262.5, 0, 159.5], [0, 262.5, 119.5], [0, 0, 1]])
        depth = jnp.asarray(rng.uniform(0.5, 5.0, (240, 320)), dtype=jnp.float32)
        pts = camera.pinhole_backproject(depth, k)
        uv, z = camera.pinhole_project(pts, k)
        np.testing.assert_allclose(z, depth, atol=1e-5)
        u_expect = np.broadcast_to(np.arange(320), (240, 320))
        v_expect = np.broadcast_to(np.arange(240)[:, None], (240, 320))
        np.testing.assert_allclose(uv[..., 0], u_expect, atol=1e-2)
        np.testing.assert_allclose(uv[..., 1], v_expect, atol=1e-2)

    def test_sphere_rays_unit_norm(self):
        rays = camera.sphere_rays(320, 1920)
        np.testing.assert_allclose(
            jnp.linalg.norm(rays, axis=-1), np.ones((320, 1920)), atol=1e-5
        )

    def test_sphere_roundtrip(self):
        h, w = 320, 1920
        depth = jnp.full((h, w), 2.5, dtype=jnp.float32)
        pts = camera.sphere_backproject(depth)
        rc, rho = camera.sphere_project(pts, h, w)
        np.testing.assert_allclose(rho, depth, atol=1e-4)
        r_expect = np.broadcast_to(np.arange(h)[:, None], (h, w))
        c_expect = np.broadcast_to(np.arange(w), (h, w))
        np.testing.assert_allclose(rc[..., 0], r_expect, atol=0.1)
        # wrap-around column: compare modulo w
        dc = np.abs(np.asarray(rc[..., 1]) - c_expect)
        dc = np.minimum(dc, w - dc)
        assert dc.max() < 0.1

    def test_sphere_convention_matches_reference(self):
        # Reference mapping (include/Frame360.h:589-593): ray for (phi, theta)
        # is (sin phi, -cos phi sin theta, -cos phi cos theta).
        phi, theta = 0.3, 1.2
        h, w = 320, 1920
        res = 2 * np.pi / w
        r = 0.5 * h - 0.5 - phi / res
        c = theta / res
        rays = camera.sphere_rays(h, w)
        # interpolate at the nearest integer pixel
        ray = np.asarray(rays[int(round(r)), int(round(c))])
        expect = np.array(
            [np.sin(phi), -np.cos(phi) * np.sin(theta), -np.cos(phi) * np.cos(theta)]
        )
        np.testing.assert_allclose(ray, expect, atol=2e-3)


class TestPyramid:
    def test_depth_pyramid_valid_mean(self):
        from rgbd360_tpu.ops import pyramid

        d = jnp.zeros((4, 4), dtype=jnp.float32)
        d = d.at[0, 0].set(2.0).at[0, 1].set(4.0)  # one 2x2 block half-valid
        out = pyramid.pyr_down_depth(d, 0.3, 20.0)
        assert out.shape == (2, 2)
        assert abs(float(out[0, 0]) - 3.0) < 1e-6  # mean of valid only
        assert float(out[1, 1]) == 0.0

    def test_gradient_monotonic_gate(self):
        from rgbd360_tpu.ops import pyramid

        img = jnp.asarray(
            np.tile(np.arange(8, dtype=np.float32), (8, 1))
        )  # monotonic in x
        gx, gy = pyramid.gradient_xy(img)
        # interior x-gradients = 1 (harmonic mean of 1 and 1)
        np.testing.assert_allclose(gx[1:-1, 1:-1], np.ones((6, 6)), atol=1e-5)
        np.testing.assert_allclose(gy[1:-1, 1:-1], np.zeros((6, 6)), atol=1e-5)
        # a local extremum emits zero gradient
        img2 = img.at[4, 4].set(100.0)
        gx2, _ = pyramid.gradient_xy(img2)
        assert float(gx2[4, 4]) == 0.0

    def test_seam_mask(self):
        from rgbd360_tpu.ops import pyramid

        g = jnp.ones((10, 1920))
        masked = pyramid.mask_seams(g, 8, 1)
        span = 1920 // 8
        for s in range(1, 8):
            assert float(masked[0, s * span - 1]) == 0.0
            assert float(masked[0, s * span]) == 0.0
        assert float(masked[0, 5]) == 1.0


class TestUndistort:
    def test_identity_model(self):
        from rgbd360_tpu.ops.undistort import undistort_depth

        mult = jnp.ones((80, 80, 5))
        counts = jnp.full((80, 80, 5), 100.0)
        d = jnp.full((240, 320), 3.3, dtype=jnp.float32)
        out = undistort_depth(d, mult, counts, 4, 3, 2.0)
        np.testing.assert_allclose(out, d, atol=1e-6)

    def test_interpolation_and_fallback(self):
        from rgbd360_tpu.ops.undistort import undistort_depth

        nbins = 5
        mult = jnp.ones((1, 1, nbins))
        mult = mult.at[0, 0, 1].set(1.1).at[0, 0, 2].set(1.3)
        counts = jnp.full((1, 1, nbins), 100.0)
        # z = 4.0, bin_depth = 2.0: idx=2, start=4.0, z-start=0 < 1 -> idx1=2,
        # idx0=1; z0 = 2*2-1 = 3; coeff1 = (4-3)/2 = 0.5 -> mult = 1.2
        d = jnp.full((3, 4), 4.0, dtype=jnp.float32)
        out = undistort_depth(d, mult, counts, 4, 3, 2.0)
        np.testing.assert_allclose(out, 4.0 * 1.2, rtol=1e-6)
        # low counts -> nearest-bin fallback (multiplier of idx=2)
        counts_low = counts.at[0, 0, 1].set(10.0)
        out2 = undistort_depth(d, mult, counts_low, 4, 3, 2.0)
        np.testing.assert_allclose(out2, 4.0 * 1.3, rtol=1e-6)
        # invalid depth passes through
        out3 = undistort_depth(jnp.zeros((3, 4)), mult, counts, 4, 3, 2.0)
        np.testing.assert_allclose(out3, 0.0)
