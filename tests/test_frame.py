"""Frame build pipeline tests on the bundled reference samples."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd360_tpu.core.frame import FrameBuilder, RigFrame
from rgbd360_tpu.io.bin_format import read_rig_frame
from rgbd360_tpu.ops import stitch as stitch_ops


@pytest.fixture(scope="module")
def builder(calibration):
    return FrameBuilder(calibration)


@pytest.fixture(scope="module")
def sphere_frame(builder, sample_paths):
    raw = read_rig_frame(sample_paths[0])
    return builder.build_from_raw(raw)


def test_sphere_shapes(sphere_frame):
    f = sphere_frame
    assert f.sphere_rgb.shape == (320, 1920, 3)
    assert f.sphere_depth.shape == (320, 1920)
    assert f.sphere_gray.shape == (320, 1920)
    assert f.cloud_xyz.shape == (8, 120, 160, 3)


def test_sphere_coverage(sphere_frame):
    # Most of the sphere should be covered by the 8 sensors (the ring has
    # full 360-deg azimuth coverage and ~50-deg vertical FOV vs the 60-deg
    # sphere crop, so expect high but not full coverage).
    rgb_filled = np.mean(np.asarray(sphere_frame.sphere_rgb).sum(-1) > 0)
    assert rgb_filled > 0.65, f"rgb coverage {rgb_filled}"
    d = np.asarray(sphere_frame.sphere_depth)
    depth_filled = np.mean(d > 0)
    assert depth_filled > 0.4, f"depth coverage {depth_filled}"
    valid = d[d > 0]
    assert 0.5 < np.median(valid) < 8.0


def test_sphere_depth_is_radial(builder, sample_paths):
    # Backprojecting the sphere depth must land points at distance == depth.
    from rgbd360_tpu.ops import camera

    raw = read_rig_frame(sample_paths[0])
    f = builder.build_from_raw(raw)
    pts = camera.sphere_backproject(f.sphere_depth)
    rho = np.linalg.norm(np.asarray(pts), axis=-1)
    d = np.asarray(f.sphere_depth)
    np.testing.assert_allclose(rho[d > 0], d[d > 0], rtol=1e-5)


def test_cloud_consistent_with_sphere(sphere_frame):
    # Cloud points (rig frame) should have ranges in the same ballpark as the
    # stitched sphere depth distribution.
    xyz = np.asarray(sphere_frame.cloud_xyz)
    valid = np.asarray(sphere_frame.cloud_valid)
    r = np.linalg.norm(xyz[valid], axis=-1)
    d = np.asarray(sphere_frame.sphere_depth)
    d = d[d > 0]
    assert abs(np.median(r) - np.median(d)) < 0.5


def test_gray_range(sphere_frame):
    g = np.asarray(sphere_frame.sphere_gray)
    assert g.min() >= 0.0 and g.max() <= 1.0
    assert g.std() > 0.02  # non-trivial texture


def test_fast_stitch(sample_paths):
    raw = read_rig_frame(sample_paths[0])
    out = stitch_ops.fast_stitch(jnp.asarray(raw.rgb))
    assert out.shape == (320, 1920, 3)


def test_build_deterministic(builder, sample_paths):
    raw = read_rig_frame(sample_paths[0])
    f1 = builder.build_from_raw(raw)
    f2 = builder.build_from_raw(raw)
    np.testing.assert_array_equal(
        np.asarray(f1.sphere_depth), np.asarray(f2.sphere_depth)
    )


def test_build_batch_bit_identical(calibration, sample_paths):
    """Batched build (ONE stitch gather for B frames) must be bit-identical
    to per-frame builds — the bench's throughput configuration."""
    import jax.numpy as jnp

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame

    builder = FrameBuilder(calibration)
    raws = [read_rig_frame(p) for p in sample_paths[:2]]
    singles = [builder.build_from_raw(r) for r in raws]
    batch = builder.build_batch(
        jnp.stack([jnp.asarray(r.rgb) for r in raws]),
        jnp.stack([jnp.asarray(r.depth_mm) for r in raws]),
    )
    for i, f in enumerate(singles):
        for name in ("sphere_gray", "sphere_depth", "sphere_rgb", "cloud_xyz"):
            a = np.nan_to_num(np.asarray(getattr(f, name)))
            b = np.nan_to_num(np.asarray(getattr(batch, name)[i]))
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_build_gray_depth_batch_bit_identical(calibration, sample_paths):
    """The gray-first tracking-path build (gray conversion BEFORE the stitch
    gather, 2-wide rows) must be bit-identical to the full build: gather is
    pure selection and gray is pointwise, so they commute exactly."""
    import jax.numpy as jnp

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame

    builder = FrameBuilder(calibration)
    raws = [read_rig_frame(p) for p in sample_paths[:2]]
    singles = [builder.build_from_raw(r) for r in raws]
    grays, depths = builder.build_gray_depth_batch(
        jnp.stack([jnp.asarray(r.rgb) for r in raws]),
        jnp.stack([jnp.asarray(r.depth_mm) for r in raws]),
    )
    for i, f in enumerate(singles):
        np.testing.assert_array_equal(
            np.asarray(f.sphere_gray), np.asarray(grays[i]), err_msg="gray"
        )
        np.testing.assert_array_equal(
            np.asarray(f.sphere_depth), np.asarray(depths[i]), err_msg="depth"
        )


def test_parallax_refined_stitch_accuracy():
    """The two-pass parallax-corrected stitch (beyond-reference accuracy:
    `ops/stitch.stitch_refined`) must reconstruct the TRUE rig-centered
    radial depth of a known synthetic room substantially better than the
    calibration-only single-pass stitch, whose sphere carries the sensors'
    ~6-8 cm offsets and the 1 m projection-point approximation."""
    from dataclasses import replace

    from rgbd360_tpu.apps.grabber import _octagon_hit, synth_capture
    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.io.calib import load_calibration
    from rgbd360_tpu.ops import camera

    # extrinsics only: CLAMS models describe REAL device distortion and
    # would corrupt the exact synthetic depth
    calibration = load_calibration(
        "/root/reference/Calibration/Extrinsics", None
    )
    rt = np.asarray(calibration.rt, np.float64)
    raw = synth_capture(0, rt=rt, room="octagon")
    cfg = default_config()
    b_plain = FrameBuilder(calibration, cfg)
    b_ref = FrameBuilder(
        calibration, replace(cfg, sphere=replace(cfg.sphere, parallax_refine=True))
    )
    f_plain = b_plain.build_from_raw(raw)
    f_ref = b_ref.build_from_raw(raw)

    # analytic ground truth: radial distance from the rig center along each
    # sphere ray to the octagon room (rays are unit-norm, so the hit
    # parameter IS the radial distance)
    rays = np.asarray(camera.sphere_rays(*f_plain.sphere_depth.shape))
    gt = _octagon_hit(np.zeros(3), rays, 3.0)

    def err(d):
        d = np.asarray(d)
        m = (d > 0) & np.isfinite(gt)
        return float(np.mean(np.abs(d - gt)[m]))

    e_plain, e_ref = err(f_plain.sphere_depth), err(f_ref.sphere_depth)
    assert e_ref < 0.2 * e_plain, (e_plain, e_ref)
    assert e_ref < 0.01, e_ref  # refined sphere is mm-accurate (plain ~4.5 cm)
    # RGB stays a valid stitch (same coverage)
    cov_p = float(np.mean(np.asarray(f_plain.sphere_depth) > 0))
    cov_r = float(np.mean(np.asarray(f_ref.sphere_depth) > 0))
    assert abs(cov_p - cov_r) < 0.02
