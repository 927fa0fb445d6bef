"""mrpt-binary PbMap interop tests (reference `Frame360::savePlanes/loadPbMap`,
`include/Frame360.h:196,313`)."""

import numpy as np
import pytest

from rgbd360_tpu.io import pbmap as P


def _rand_plane(rng, label=""):
    n = rng.normal(size=3)
    n /= np.linalg.norm(n)
    return P.PbPlane(
        num_observations=int(rng.integers(80, 4000)),
        area_voxels=float(rng.uniform(0.1, 4.0)),
        area_hull=float(rng.uniform(0.1, 4.0)),
        elongation=float(rng.uniform(1.0, 5.0)),
        normal=n.astype(np.float32),
        center=rng.uniform(-3, 3, 3).astype(np.float32),
        ppal_dir=np.float32(np.cross(n, [0, 0, 1.0])),
        color_nrgb=rng.uniform(0, 1, 3).astype(np.float32),
        dominant_intensity=float(rng.uniform(0, 1)),
        b_dominant_color=bool(rng.integers(0, 2)),
        hist_h=rng.uniform(0, 1, 37).astype(np.float32),
        inliers=rng.integers(0, 76800, 50, dtype=np.int32),
        label=label,
        label_object="wall" if label else "",
        polygon=rng.uniform(-3, 3, (9, 3)).astype(np.float32),
    )


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(tmp_path, compress):
    rng = np.random.default_rng(0)
    planes = [_rand_plane(rng, label=f"p{i}") for i in range(5)]
    path = tmp_path / "frame_planes.pbmap"
    P.write_pbmap(path, planes, compress=compress)
    assert (path.read_bytes()[:2] == b"\x1f\x8b") == compress
    back = P.read_pbmap(path)
    assert len(back) == 5
    for a, b in zip(planes, back):
        assert b.num_observations == a.num_observations
        assert b.label == a.label and b.label_object == a.label_object
        np.testing.assert_array_equal(b.normal, a.normal)
        np.testing.assert_array_equal(b.center, a.center)
        np.testing.assert_array_equal(b.hist_h, a.hist_h)
        np.testing.assert_array_equal(b.inliers, a.inliers)
        np.testing.assert_array_equal(b.polygon, a.polygon)
        assert b.b_dominant_color == a.b_dominant_color
        assert abs(b.d - a.d) < 1e-6


def test_layout_mismatch_is_loud(tmp_path):
    """A wrong payload layout must hit the 0x88 end-flag check, not misparse."""
    import gzip

    path = tmp_path / "bad.pbmap"
    name = b"PbMap"
    # count=1 plane but garbage payload
    inner = b"Plane".join([bytes([0x80 | 5])] * 2)
    with gzip.open(path, "wb") as f:
        f.write(bytes([0x80 | len(name)]) + name + bytes([0]))
        f.write(b"\x01\x00\x00\x00" + bytes([0x80 | 5]) + b"Plane" + bytes([0]))
        f.write(b"\x00" * 120)
    with pytest.raises(P.RawlogError):
        P.read_pbmap(path)


def test_unsupported_version(tmp_path):
    import gzip

    path = tmp_path / "v9.pbmap"
    with gzip.open(path, "wb") as f:
        f.write(bytes([0x80 | 5]) + b"PbMap" + bytes([9]))
    with pytest.raises(P.UnsupportedVersionError):
        P.read_pbmap(path)


def test_planeset_bridge_real_frame(tmp_path, calibration, sample_paths):
    """Segment a real capture, save as .pbmap, reload into a PlaneSet, and
    plane-register reloaded-vs-original: the identity pose must come back."""
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.registration.planes import PLANAR_3DOF, PlaneRegistration

    b = FrameBuilder(calibration)
    f = b.build_from_raw(read_rig_frame(sample_paths[0]))
    ps = b.segment_planes(f)
    n_orig = int(np.sum(np.asarray(ps.valid)))
    assert n_orig >= 5

    path = tmp_path / "spherePlanes_1.pbmap"
    P.write_pbmap(path, P.planeset_to_pbplanes(ps))
    back = P.pbplanes_to_planeset(
        P.read_pbmap(path),
        max_planes=ps.d.shape[0],
        hull_dirs=ps.hull.shape[1],
    )
    assert int(np.sum(np.asarray(back.valid))) == n_orig
    np.testing.assert_allclose(
        np.sort(np.asarray(back.area)[np.asarray(back.valid)]),
        np.sort(np.asarray(ps.area)[np.asarray(ps.valid)]),
        rtol=1e-5,
    )

    reg = PlaneRegistration(b.config.matcher)
    res = reg.register(back, ps, mode=PLANAR_3DOF)
    assert bool(res.success)
    pose = np.asarray(res.pose)
    assert np.linalg.norm(pose[:3, 3]) < 0.05
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=0.05)


def test_view_frame_pcd_pbmap_pair(tmp_path, calibration, sample_paths):
    """End-to-end: export a frame as PCD+pbmap, reload the pair through the
    viewer app (reference LoadSphere / load_PbMap_Cloud)."""
    from rgbd360_tpu.apps import view_frame

    out1 = tmp_path / "exp"
    view_frame.main(
        [str(sample_paths[0]), "--out", str(out1), "--planes", "--cloud"]
    )
    tag = sample_paths[0].stem
    pcd = out1 / f"{tag}_cloud.pcd"
    pbm = out1 / f"{tag}_planes.pbmap"
    assert pcd.exists() and pbm.exists()

    out2 = tmp_path / "view"
    view_frame.main([str(pcd), "--out", str(out2), "--pbmap", str(pbm)])
    assert (out2 / f"{tag}_cloud_pano.png").exists()
