"""Rawlog ingest tests (reference `Visualization/LoadRawlog.cpp` capability)."""

import gzip

import numpy as np
import pytest

from rgbd360_tpu.io import rawlog as R
from rgbd360_tpu.io.bin_format import read_rig_frame

S1 = "/root/reference/samples/sphere_images_1.bin"


def _smooth_rgb(rng, shape):
    """Smooth structured image — JPEG (what MRPT stores color CImages as)
    round-trips natural images closely but random noise poorly."""
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    p = rng.uniform(0.02, 0.2, 6)
    img = np.stack(
        [
            127 + 120 * np.sin(p[2 * i] * xx + p[2 * i + 1] * yy + i)
            for i in range(3)
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _rand_obs(rng, label, ts, shape=(24, 32)):
    rt = np.eye(4)
    # a random-ish rotation via two axis rolls keeps the quaternion generic
    a, b = rng.uniform(-np.pi, np.pi, 2)
    ca, sa, cb, sb = np.cos(a), np.sin(a), np.cos(b), np.sin(b)
    rt[:3, :3] = (
        np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
        @ np.array([[1, 0, 0], [0, cb, -sb], [0, sb, cb]])
    )
    rt[:3, 3] = rng.uniform(-1, 1, 3)
    return R.Obs3DRangeScan(
        sensor_label=label,
        timestamp=ts,
        sensor_pose=rt,
        range_image=rng.uniform(0.3, 9.0, shape).astype(np.float32),
        intensity_image=_smooth_rgb(rng, shape),
    )


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(tmp_path, compress):
    rng = np.random.default_rng(0)
    t0 = R.unix_to_mrpt_timestamp(1.4e9)
    obs = [_rand_obs(rng, f"RGBD{i + 1}", t0 + i) for i in range(3)]
    obs.append(
        R.Obs2DRangeScan(
            sensor_label="LASER",
            timestamp=t0,
            ranges=rng.uniform(0, 50, 181).astype(np.float32),
            validity=(rng.uniform(size=181) > 0.1).astype(np.uint8),
        )
    )
    path = tmp_path / "log.rawlog"
    R.write_rawlog(path, obs, compress=compress)
    assert (path.read_bytes()[:2] == b"\x1f\x8b") == compress
    back = list(R.read_rawlog(path))
    assert len(back) == 4
    for a, b in zip(obs[:3], back[:3]):
        assert b.sensor_label == a.sensor_label
        assert b.timestamp == a.timestamp
        np.testing.assert_allclose(b.sensor_pose, a.sensor_pose, atol=1e-12)
        np.testing.assert_array_equal(b.range_image, a.range_image)
        # color CImages ride as JPEG in the MRPT wire format (lossy)
        assert b.intensity_image.shape == a.intensity_image.shape
        err = np.abs(
            b.intensity_image.astype(np.int32) - a.intensity_image.astype(np.int32)
        )
        assert err.mean() < 4.0, err.mean()
    laser = back[3]
    assert isinstance(laser, R.Obs2DRangeScan)
    np.testing.assert_array_equal(laser.ranges, obs[3].ranges)
    np.testing.assert_array_equal(laser.validity, obs[3].validity)


def test_timestamp_conversion():
    t = 1.7e9 + 0.1234567
    assert abs(R.mrpt_to_unix_timestamp(R.unix_to_mrpt_timestamp(t)) - t) < 1e-6


def test_rig_frame_roundtrip(tmp_path):
    """Real sample capture -> rawlog -> assembled rig frame, bit-exact."""
    raw = read_rig_frame(S1)
    obs = R.rig_frame_to_observations(raw, timestamp=R.unix_to_mrpt_timestamp(1e9))
    path = tmp_path / "rig.rawlog"
    R.write_rawlog(path, obs)
    frames = list(R.assemble_rig_frames(R.read_rawlog(path), num_sensors=8))
    assert len(frames) == 1
    # RGB rides as JPEG (the MRPT color-CImage wire format): near-lossless
    # on natural images, not bit-exact
    err = np.abs(frames[0].rgb.astype(np.int32) - raw.rgb.astype(np.int32))
    assert err.mean() < 3.0, err.mean()
    # u16 mm -> f32 m (CMatrix, lossless) -> u16 mm is exact
    np.testing.assert_array_equal(frames[0].depth_mm, raw.depth_mm)


def test_four_camera_tiling(tmp_path):
    """4 labels tile into 8 ring slots with the reference arrangement
    (`LoadRawlog.cpp:72,245-250`)."""
    rng = np.random.default_rng(1)
    t0 = R.unix_to_mrpt_timestamp(1e9)
    # two cycles so the label count is inferred from the repeat
    obs = [_rand_obs(rng, f"RGBD{i + 1}", t0 + i) for i in range(4)]
    obs += [_rand_obs(rng, f"RGBD{i + 1}", t0 + 500000 + i) for i in range(4)]
    frames = list(R.assemble_rig_frames(obs, num_sensors=8))
    assert len(frames) == 2
    f = frames[0]
    assert f.rgb.shape == (8, 24, 32, 3)
    arr = R.DEFAULT_ARRANGEMENT
    for slot in range(8):
        np.testing.assert_array_equal(
            f.rgb[slot], obs[arr[slot % 4]].intensity_image
        )


def test_sync_window_drops_mixed_frames():
    rng = np.random.default_rng(2)
    t0 = R.unix_to_mrpt_timestamp(1e9)
    second = R.unix_to_mrpt_timestamp(1e9 + 1.0)
    obs = [
        _rand_obs(rng, "RGBD1", t0),
        _rand_obs(rng, "RGBD2", t0 + 1),
        _rand_obs(rng, "RGBD1", second),  # RGBD2 dropped out for a second
        _rand_obs(rng, "RGBD2", second + 1),
    ]
    frames = list(R.assemble_rig_frames(obs, num_cameras=2, num_sensors=2))
    assert len(frames) == 2  # both frames are internally synchronized
    obs_mixed = [obs[0], _rand_obs(rng, "RGBD2", second)]
    assert not list(R.assemble_rig_frames(obs_mixed, num_cameras=2, num_sensors=2))


def test_unsupported_version_raises(tmp_path):
    path = tmp_path / "bad.rawlog"
    name = b"CObservation3DRangeScan"
    with gzip.open(path, "wb") as f:
        f.write(bytes([0x80 | len(name)]) + name + bytes([42]))  # future ver
    with pytest.raises(R.UnsupportedVersionError, match="version 42"):
        list(R.read_rawlog(path))


def test_mrpt_wire_layout_golden():
    """Byte-level golden check of the MRPT 1.x framing this build must both
    emit and parse: a gray CImage v7 hand-assembled exactly as
    `CImage::writeToStream` lays it out."""
    import io as _io
    import struct

    img = np.arange(6 * 6, dtype=np.uint8).reshape(6, 6)
    name = b"CImage"
    payload = (
        b"\x00"  # not external (v>=6)
        + b"\x00"  # not color
        + struct.pack("<iiiI", 6, 6, 0, 6 * 8)  # width, height, origin, size
        + b"\x00"  # not zip-compressed
        + b"".join(bytes(row) + b"\x00\x00" for row in img)  # 4-byte stride
    )
    wire = bytes([0x80 | len(name)]) + name + bytes([7]) + payload + b"\x88"
    got = R._read_object(R._Reader(_io.BytesIO(wire)))[1]
    np.testing.assert_array_equal(got, img)
    # and the writer emits a stream the reader maps back to the same image
    buf = _io.BytesIO()
    R._write_object(R._Writer(buf), "CImage", img)
    buf.seek(0)
    np.testing.assert_array_equal(R._read_object(R._Reader(buf))[1], img)


def test_cpose3d_legacy_versions():
    """CPose3D v0 (nested CMatrix 4x4 f32) and v1 (CMatrixD) parse."""
    import io as _io
    import struct

    rt = np.eye(4)
    rt[:3, 3] = [1.5, -2.0, 0.25]

    def frame(name: bytes, version: int, payload: bytes) -> bytes:
        return bytes([0x80 | len(name)]) + name + bytes([version]) + payload + b"\x88"

    m_f32 = frame(
        b"CMatrix", 0, struct.pack("<II", 4, 4) + rt.astype("<f4").tobytes()
    )
    m_f64 = frame(
        b"CMatrixD", 0, struct.pack("<II", 4, 4) + rt.astype("<f8").tobytes()
    )
    for ver, nested in ((0, m_f32), (1, m_f64)):
        wire = frame(b"CPose3D", ver, nested)
        got = R._read_object(R._Reader(_io.BytesIO(wire)))[1]
        np.testing.assert_allclose(got, rt, atol=1e-6)


def test_sensory_frame_unwraps(tmp_path):
    """Format-#1 rawlogs (CSensoryFrame containers) flatten on read."""
    import io as _io
    import struct

    rng = np.random.default_rng(3)
    obs = [_rand_obs(rng, f"RGBD{i+1}", 1000 + i) for i in range(2)]
    inner = _io.BytesIO()
    w = R._Writer(inner)
    for o in obs:
        R._write_object(w, "CObservation3DRangeScan", o)
    name = b"CSensoryFrame"
    wire = (
        bytes([0x80 | len(name)])
        + name
        + bytes([2])
        + struct.pack("<I", 2)
        + inner.getvalue()
        + b"\x88"
    )
    path = tmp_path / "sf.rawlog"
    path.write_bytes(wire)
    back = list(R.read_rawlog(path))
    assert [o.sensor_label for o in back] == ["RGBD1", "RGBD2"]
    np.testing.assert_array_equal(back[0].range_image, obs[0].range_image)


def test_tcamera_roundtrip():
    import io as _io

    cam = R.TCamera(
        intrinsics=np.array([[520.0, 0, 319.5], [0, 521.0, 239.5], [0, 0, 1]]),
        dist=np.array([0.1, -0.2, 0.001, 0.002, 0.05]),
        focal_length_meters=0.0021,
        nrows=480,
        ncols=640,
    )
    buf = _io.BytesIO()
    R._write_object(R._Writer(buf), "TCamera", cam)
    buf.seek(0)
    got = R._read_object(R._Reader(buf))[1]
    np.testing.assert_array_equal(got.intrinsics, cam.intrinsics)
    np.testing.assert_array_equal(got.dist, cam.dist)
    assert (got.nrows, got.ncols) == (480, 640)
    assert got.focal_length_meters == cam.focal_length_meters


def _framed_junk(name: bytes, payload: bytes) -> bytes:
    """An object of a class this module has no codec for (e.g. the
    CActionCollection odometry containers of format-#1 rawlogs)."""
    return bytes([0x80 | len(name)]) + name + bytes([0]) + payload + b"\x88"


def test_unknown_class_skipped(tmp_path):
    """A rawlog containing only unreadable classes yields no observations
    (the reader resyncs to EOF instead of aborting)."""
    path = tmp_path / "bad2.rawlog"
    path.write_bytes(_framed_junk(b"CActionCollection", b"\x01\x02\x03" * 11))
    assert list(R.read_rawlog(path)) == []


def test_format1_action_collections_skipped(tmp_path):
    """Real format-#1 rawlogs interleave CActionCollection odometry objects
    with the sensory frames; the reference's loader discards the actions
    (`LoadRawlog.cpp:182-188`) and so does this reader — by resynchronizing
    on the next readable object's begin marker (MRPT framing carries no
    payload length, so unknown payloads cannot be skipped structurally)."""
    import io as _io
    import struct

    rng = np.random.default_rng(5)
    obs = [_rand_obs(rng, f"RGBD{i+1}", 2000 + i) for i in range(2)]
    inner = _io.BytesIO()
    w = R._Writer(inner)
    for o in obs:
        R._write_object(w, "CObservation3DRangeScan", o)
    name = b"CSensoryFrame"
    sf = (
        bytes([0x80 | len(name)])
        + name
        + bytes([2])
        + struct.pack("<I", 2)
        + inner.getvalue()
        + b"\x88"
    )
    bare = _io.BytesIO()
    R._write_object(R._Writer(bare), "CObservation3DRangeScan",
                    _rand_obs(rng, "RGBD3", 2002))
    junk = bytes(rng.integers(0, 256, 257, dtype=np.uint8))
    wire = (
        _framed_junk(b"CActionCollection", junk)
        + sf
        + _framed_junk(b"CActionCollection", junk[::-1])
        + bare.getvalue()
    )
    path = tmp_path / "fmt1.rawlog"
    path.write_bytes(wire)
    back = list(R.read_rawlog(path))
    assert [o.sensor_label for o in back] == ["RGBD1", "RGBD2", "RGBD3"]
    np.testing.assert_array_equal(back[0].range_image, obs[0].range_image)


def test_empty_cimage_rewrite():
    """A read 0x0 color CImage (v7+ size==0 convention) must survive a
    write-back — the writer mirrors the reader's empty-image encoding."""
    import io as _io

    buf = _io.BytesIO()
    R._write_object(R._Writer(buf), "CImage", np.zeros((0, 0, 3), np.uint8))
    buf.seek(0)
    img = R._read_object(R._Reader(buf))[1]
    assert img.shape == (0, 0, 3)


def test_load_rawlog_app(tmp_path):
    from rgbd360_tpu.apps import load_rawlog

    raw = read_rig_frame(S1)
    path = tmp_path / "capture.rawlog"
    R.write_rawlog(path, R.rig_frame_to_observations(raw))
    out = tmp_path / "bins"
    n = load_rawlog.main([str(path), "--out", str(out), "--to-bin"])
    assert n == 1
    back = read_rig_frame(out / "sphere_images_1.bin")
    err = np.abs(back.rgb.astype(np.int32) - raw.rgb.astype(np.int32))
    assert err.mean() < 3.0  # JPEG-carried color (see test_rig_frame_roundtrip)
    np.testing.assert_array_equal(back.depth_mm, raw.depth_mm)


class TestAdversarial:
    """Negative/adversarial codec probes (docs/MRPT_WIRE.md): a wrong layout
    derivation must fail LOUDLY — truncation, external storage, version
    probes, corrupt end flags, and format-#1 action-object interleaving."""

    @staticmethod
    def _frame(name: bytes, version: int, payload: bytes) -> bytes:
        return (
            bytes([0x80 | len(name)]) + name + bytes([version & 0xFF])
            + payload + b"\x88"
        )

    def test_truncated_stream_raises(self, tmp_path):
        rng = np.random.default_rng(7)
        import io as _io

        buf = _io.BytesIO()
        R._write_object(
            R._Writer(buf), "CObservation3DRangeScan", _rand_obs(rng, "RGBD1", 5)
        )
        wire = buf.getvalue()
        for cut in (len(wire) // 4, len(wire) // 2, len(wire) - 1):
            path = tmp_path / f"cut{cut}.rawlog"
            path.write_bytes(wire[:cut])
            with pytest.raises(R.RawlogError):
                list(R.read_rawlog(path))

    def test_external_storage_cimage_refused(self, tmp_path):
        import struct

        payload = b"\x01" + struct.pack("<I", 8) + b"img_0001"  # external + file
        wire = self._frame(b"CImage", 7, payload)
        import io as _io

        with pytest.raises(R.RawlogError, match="external storage"):
            R._read_object(R._Reader(_io.BytesIO(wire)))

    def test_external_storage_obs3d_markers_refused(self):
        """v>=3 external points3D / rangeImage markers refuse loudly."""
        import io as _io

        rng = np.random.default_rng(11)
        o = _rand_obs(rng, "RGBD1", 9)
        buf = _io.BytesIO()
        R._write_object(R._Writer(buf), "CObservation3DRangeScan", o)
        wire = bytearray(buf.getvalue())
        # the external markers are [B0 str "" B0 str ""] right after the
        # label; find the label and flip the first marker byte
        lbl = b"RGBD1"
        i = bytes(wire).find(lbl) + len(lbl)
        assert wire[i] == 0
        wire[i] = 1
        wire[i + 1 : i + 1] = struct_pack_str("pts_ext")
        with pytest.raises(R.RawlogError, match="externally"):
            R._read_object(R._Reader(_io.BytesIO(bytes(wire))))

    @pytest.mark.parametrize(
        "cls,supported",
        sorted((k, v) for k, v in R._SUPPORTED_VERSIONS.items()),
    )
    def test_version_probes_never_misparse(self, cls, supported):
        """Every version outside the supported range must raise
        UnsupportedVersionError BEFORE any payload bytes are consumed — a
        probe across the full i8 range can never silently misparse."""
        import io as _io

        name = cls.encode()
        for ver in list(range(-3, 35)) + [100, 127, -128]:
            if ver in supported:
                continue
            wire = bytes([0x80 | len(name)]) + name + struct_pack_i8(ver)
            with pytest.raises(R.UnsupportedVersionError):
                R._read_object(R._Reader(_io.BytesIO(wire)))

    def test_corrupt_end_flag_names_object(self):
        import io as _io
        import struct

        payload = struct.pack("<II", 1, 1) + struct.pack("<f", 2.0)
        wire = (
            bytes([0x80 | len(b"CMatrix")]) + b"CMatrix" + bytes([0])
            + payload + b"\x00"  # corrupt end flag
        )
        with pytest.raises(R.RawlogError, match="CMatrix"):
            R._read_object(R._Reader(_io.BytesIO(wire)))

    def test_format1_multiple_action_objects(self, tmp_path):
        """A format-#1 stream interleaving SEVERAL unknown action objects
        (CActionCollection + CActionRobotMovement2D framings with arbitrary
        payload bytes) between sensory frames still yields every
        observation via resync."""
        import io as _io
        import struct

        rng = np.random.default_rng(13)

        def action_blob(name: bytes, junk: bytes) -> bytes:
            return bytes([0x80 | len(name)]) + name + bytes([1]) + junk + b"\x88"

        def sensory_frame(obs_list) -> bytes:
            inner = _io.BytesIO()
            w = R._Writer(inner)
            for o in obs_list:
                R._write_object(w, "CObservation3DRangeScan", o)
            nm = b"CSensoryFrame"
            return (
                bytes([0x80 | len(nm)]) + nm + bytes([2])
                + struct.pack("<I", len(obs_list)) + inner.getvalue() + b"\x88"
            )

        stream = b""
        want = []
        for k in range(3):
            stream += action_blob(
                b"CActionCollection", rng.bytes(17 + 5 * k)
            )
            stream += action_blob(b"CActionRobotMovement2D", rng.bytes(33))
            obs = [_rand_obs(rng, f"RGBD{i+1}", 100 * k + i) for i in range(2)]
            want += [o.sensor_label + str(o.timestamp) for o in obs]
            stream += sensory_frame(obs)
        path = tmp_path / "fmt1_multi.rawlog"
        with gzip.open(path, "wb") as f:
            f.write(stream)
        got = [o.sensor_label + str(o.timestamp) for o in R.read_rawlog(path)]
        assert got == want


def struct_pack_str(s: str) -> bytes:
    import struct

    b = s.encode()
    return struct.pack("<I", len(b)) + b


def struct_pack_i8(v: int) -> bytes:
    import struct

    return struct.pack("<b", v)
