"""Rawlog ingest tests (reference `Visualization/LoadRawlog.cpp` capability)."""

import gzip

import numpy as np
import pytest

from rgbd360_tpu.io import rawlog as R
from rgbd360_tpu.io.bin_format import read_rig_frame

S1 = "/root/reference/samples/sphere_images_1.bin"


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
        intensity_image=rng.integers(0, 255, (*shape, 3), dtype=np.uint8),
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
        np.testing.assert_array_equal(b.intensity_image, a.intensity_image)
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
    np.testing.assert_array_equal(frames[0].rgb, raw.rgb)
    # u16 mm -> f32 m -> u16 mm is exact
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
        f.write(bytes([0x80 | len(name)]) + name + bytes([7]))  # mrpt 1.x ver
    with pytest.raises(R.UnsupportedVersionError, match="version 7"):
        list(R.read_rawlog(path))


def test_unknown_class_raises(tmp_path):
    path = tmp_path / "bad2.rawlog"
    name = b"CActionCollection"
    with open(path, "wb") as f:
        f.write(bytes([0x80 | len(name)]) + name + bytes([0]))
    with pytest.raises(R.RawlogError, match="CActionCollection"):
        list(R.read_rawlog(path))


def test_load_rawlog_app(tmp_path):
    from rgbd360_tpu.apps import load_rawlog

    raw = read_rig_frame(S1)
    path = tmp_path / "capture.rawlog"
    R.write_rawlog(path, R.rig_frame_to_observations(raw))
    out = tmp_path / "bins"
    n = load_rawlog.main([str(path), "--out", str(out), "--to-bin"])
    assert n == 1
    back = read_rig_frame(out / "sphere_images_1.bin")
    np.testing.assert_array_equal(back.rgb, raw.rgb)
    np.testing.assert_array_equal(back.depth_mm, raw.depth_mm)
