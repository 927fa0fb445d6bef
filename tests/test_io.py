"""Data-layer tests: .bin parsing round-trip, CLAMS models, calibration."""

import numpy as np
import pytest

from rgbd360_tpu.io.bin_format import RawRigFrame, read_rig_frame, write_rig_frame
from rgbd360_tpu.io.calib import load_calibration
from rgbd360_tpu.io.clams import load_clams_model


def test_read_sample_shapes(sample_paths):
    f = read_rig_frame(sample_paths[0])
    assert f.rgb.shape == (8, 240, 320, 3)
    assert f.rgb.dtype == np.uint8
    assert f.depth_mm.shape == (8, 240, 320)
    assert f.depth_mm.dtype == np.uint16
    # Sanity: images are non-trivial, depth has valid + invalid pixels.
    assert f.rgb.std() > 1.0
    valid = f.depth_mm > 0
    assert 0.1 < valid.mean() < 1.0
    d = f.depth_m[valid]
    assert 0.2 < np.median(d) < 10.0


def test_roundtrip(tmp_path, rng):
    frame = RawRigFrame(
        rgb=rng.integers(0, 255, (8, 240, 320, 3), dtype=np.uint8),
        depth_mm=rng.integers(0, 5000, (8, 240, 320), dtype=np.uint16),
        timestamp=123456789,
    )
    p = tmp_path / "sphere_images_7.bin"
    write_rig_frame(p, frame)
    back = read_rig_frame(p)
    np.testing.assert_array_equal(back.rgb, frame.rgb)
    np.testing.assert_array_equal(back.depth_mm, frame.depth_mm)
    assert back.timestamp == frame.timestamp


def test_roundtrip_matches_reference_size(tmp_path, sample_paths):
    # The writer must reproduce the reference byte layout exactly.
    f = read_rig_frame(sample_paths[0])
    p = tmp_path / "copy.bin"
    write_rig_frame(p, f)
    assert p.read_bytes() == sample_paths[0].read_bytes()


def test_clams_model():
    path = "/root/reference/Calibration/Intrinsics/distortion_model1"
    try:
        m = load_clams_model(path)
    except FileNotFoundError:
        pytest.skip("no reference intrinsics")
    assert m.width == 640 and m.height == 480
    assert m.bin_width == 8 and m.bin_height == 6
    assert m.multipliers.shape == m.counts.shape
    assert m.multipliers.shape[:2] == (m.height // m.bin_height, m.width // m.bin_width)
    # Multipliers should be near 1 (small corrections).
    assert 0.5 < np.median(m.multipliers) < 1.5
    q = m.downsampled(2)
    assert q.width == 320 and q.bin_width == 4 and q.bin_height == 3


def test_calibration(calibration):
    c = calibration
    assert c.rt.shape == (8, 4, 4)
    # Extrinsics are rigid transforms.
    for s in range(8):
        r = c.rt[s, :3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
        np.testing.assert_allclose(
            c.rt[s] @ c.rt_inv[s], np.eye(4), atol=1e-4
        )
    # The rig is a ring: sensor axes should cover ~360 deg in 45-deg steps.
    z_axes = c.rt[:, :3, 2]
    angles = np.sort(np.arctan2(z_axes[:, 1], z_axes[:, 2]))
    gaps = np.diff(angles)
    assert np.all(gaps > 0.5) and np.all(gaps < 1.1)  # ~45 deg = 0.785 rad
    assert c.clams_multipliers.shape[0] == 8


def test_sequence_dataset(sample_paths, tmp_path):
    from rgbd360_tpu.io.dataset import SequenceDataset

    ds = SequenceDataset(sample_paths[0].parent)
    assert len(ds) == len(sample_paths)
    assert ds.indices == sorted(ds.indices)
    frames = list(ds)
    assert len(frames) == len(ds)
    assert frames[0].rgb.shape == (8, 240, 320, 3)


class TestPCD:
    """PCL .pcd interchange (reference `Frame360::save` writes keyframe
    clouds as .pcd, `include/Frame360.h:321`; `loadCloud:187` reads them)."""

    def test_roundtrip_binary_rgb(self, tmp_path):
        from rgbd360_tpu.io.pcd import read_pcd, write_pcd

        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(257, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (257, 3), dtype=np.uint8)
        n = write_pcd(tmp_path / "c.pcd", xyz, rgb)
        assert n == 257
        x2, c2 = read_pcd(tmp_path / "c.pcd")
        np.testing.assert_allclose(x2, xyz, rtol=1e-6)
        np.testing.assert_array_equal(c2, rgb)

    def test_roundtrip_ascii_no_rgb(self, tmp_path):
        from rgbd360_tpu.io.pcd import read_pcd, write_pcd

        xyz = np.array([[1.5, -2.25, 3.0], [0.0, 0.125, -4.5]], np.float32)
        write_pcd(tmp_path / "a.pcd", xyz, binary=False)
        x2, c2 = read_pcd(tmp_path / "a.pcd")
        np.testing.assert_allclose(x2, xyz, rtol=1e-5)
        assert c2 is None

    def test_reads_foreign_pcd_with_extra_fields(self, tmp_path):
        """PCL often writes extra fields (normals, intensity) and organized
        layouts; the reader must skip what it does not need."""
        from rgbd360_tpu.io.pcd import read_pcd

        header = (
            "VERSION 0.7\nFIELDS x y z normal_x intensity\n"
            "SIZE 4 4 4 4 4\nTYPE F F F F F\nCOUNT 1 1 1 1 1\n"
            "WIDTH 2\nHEIGHT 2\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS 4\nDATA ascii\n"
        )
        rows = "\n".join(
            f"{i} {i + 0.5} {-i} 0.0 {i * 10}" for i in range(4)
        )
        (tmp_path / "f.pcd").write_text(header + rows + "\n")
        xyz, rgb = read_pcd(tmp_path / "f.pcd")
        assert xyz.shape == (4, 3) and rgb is None
        np.testing.assert_allclose(xyz[:, 0], [0, 1, 2, 3])
        np.testing.assert_allclose(xyz[:, 2], [0, -1, -2, -3])

    def test_nan_rows_dropped_for_flat_input(self, tmp_path):
        from rgbd360_tpu.io.pcd import read_pcd, write_pcd

        xyz = np.array([[1, 1, 1], [np.nan, 0, 0], [2, 2, 2]], np.float32)
        n = write_pcd(tmp_path / "n.pcd", xyz)
        assert n == 2
        x2, _ = read_pcd(tmp_path / "n.pcd")
        assert x2.shape == (2, 3)
