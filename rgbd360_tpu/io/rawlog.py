"""MRPT rawlog ingest — the `LoadRawlog` capability of the reference.

The reference's `Visualization/LoadRawlog.cpp:58-100` streams an MRPT rawlog
(a gzip file of serialized `mrpt::slam` observation objects), collects
`CObservation3DRangeScan` observations by sensor label ``RGBD1..RGBD4``,
permutes them with a fixed sensor arrangement, attaches construction-spec
ring poses (45-deg chain, first sensor 0.055 m off axis —
`LoadRawlog.cpp:72-92`), converts the float-meter range image to u16 mm
(`LoadRawlog.cpp:267-272`), and feeds the standard `Frame360` pipeline.

This module provides the same ingest path for the TPU framework:

* the MRPT *container* wire format — gzip (``CFileGZInputStream``) stream of
  objects framed as ``[u8 0x80|len][class name][i8 version][payload][u8 0x88]``
  with ``<u32 len><bytes>`` strings — is implemented faithfully;
* *payload* codecs are pinned to the exact class versions listed below.
  ``CPose3D`` v2 (translation + quaternion, 7 f64) and ``CMatrix`` v0
  (u32 rows, u32 cols, row-major f32) follow the MRPT 1.x layouts.  For the
  observation and image classes, whose historical layouts changed across many
  MRPT releases and cannot be validated in this environment (MRPT is not
  available and the reference bundles no rawlog), this codec pins its own
  documented layouts at version 100; a file carrying any other version raises
  :class:`UnsupportedVersionError` *loudly* instead of misparsing, and the
  supported ingest path for foreign captures remains conversion to the
  ``sphere_images_*.bin`` format (`io/bin_format.py`).

Observation-only rawlogs ("format #2", what `getActionObservationPairOrObservation`
consumes at `LoadRawlog.cpp:182-188`) are supported for read and write.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import BinaryIO, Iterable, Iterator

import numpy as np

from .bin_format import RawRigFrame

_END_FLAG = 0x88  # mrpt SERIALIZATION_END_FLAG
_GZIP_MAGIC = b"\x1f\x8b"

# Epoch offset between the MRPT TTimeStamp epoch (1601-01-01, 100 ns units —
# Windows FILETIME convention) and the unix epoch.
_MRPT_UNIX_EPOCH_100NS = 116444736000000000


class RawlogError(ValueError):
    pass


class UnsupportedVersionError(RawlogError):
    def __init__(self, cls: str, version: int, supported: tuple[int, ...]):
        super().__init__(
            f"{cls} serialization version {version} is not supported (this "
            f"build reads versions {supported}); convert the capture to the "
            "sphere_images_*.bin format (io/bin_format.py) to ingest it"
        )
        self.cls, self.version = cls, version


def unix_to_mrpt_timestamp(t_unix: float) -> int:
    return int(round(t_unix * 1e7)) + _MRPT_UNIX_EPOCH_100NS


def mrpt_to_unix_timestamp(ts: int) -> float:
    return (ts - _MRPT_UNIX_EPOCH_100NS) * 1e-7


# ---------------------------------------------------------------------------
# observation dataclasses

@dataclass
class Obs3DRangeScan:
    """RGB-D observation (mrpt `CObservation3DRangeScan` subset used by the
    reference: rangeImage, intensityImage, sensorPose, sensorLabel,
    timestamp — `LoadRawlog.cpp:199-283`)."""

    sensor_label: str = ""
    timestamp: int = 0  # MRPT TTimeStamp (100 ns since 1601)
    sensor_pose: np.ndarray = field(default_factory=lambda: np.eye(4))
    max_range: float = 10.0
    std_error: float = 0.01
    range_image: np.ndarray | None = None  # (H, W) float32 meters
    intensity_image: np.ndarray | None = None  # (H, W, 3) u8 BGR or (H, W) u8
    confidence_image: np.ndarray | None = None
    points3d: np.ndarray | None = None  # (N, 3) float32


@dataclass
class Obs2DRangeScan:
    """Planar laser observation (the `LASER` label branch,
    `LoadRawlog.cpp:219-222`)."""

    sensor_label: str = ""
    timestamp: int = 0
    sensor_pose: np.ndarray = field(default_factory=lambda: np.eye(4))
    aperture: float = float(np.pi)
    right_to_left: bool = True
    max_range: float = 80.0
    ranges: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    validity: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))


# ---------------------------------------------------------------------------
# primitive wire helpers

class _Reader:
    def __init__(self, f: BinaryIO):
        self.f = f

    def bytes(self, n: int) -> bytes:
        b = self.f.read(n)
        if len(b) != n:
            raise RawlogError("unexpected end of rawlog stream")
        return b

    def u8(self) -> int:
        return self.bytes(1)[0]

    def unpack(self, fmt: str):
        return struct.unpack(fmt, self.bytes(struct.calcsize(fmt)))

    def string(self) -> str:
        (n,) = self.unpack("<I")
        return self.bytes(n).decode("latin-1")

    def peek_eof(self) -> bool:
        b = self.f.read(1)
        if not b:
            return True
        self.f = _Pushback(self.f, b)
        return False


class _Pushback:
    def __init__(self, f: BinaryIO, pending: bytes):
        self._f, self._pending = f, pending

    def read(self, n: int = -1) -> bytes:
        p, self._pending = self._pending, b""
        if n is None or n < 0:
            return p + self._f.read()
        return p + self._f.read(n - len(p)) if len(p) < n else p[:n]


class _Writer:
    def __init__(self, f: BinaryIO):
        self.f = f

    def pack(self, fmt: str, *vals):
        self.f.write(struct.pack(fmt, *vals))

    def string(self, s: str):
        b = s.encode("latin-1")
        self.pack("<I", len(b))
        self.f.write(b)


def _pose_to_quat(rt: np.ndarray) -> np.ndarray:
    """4x4 -> (x, y, z, qr, qx, qy, qz) — the CPose3D v2 payload order."""
    from rgbd360_tpu.apps._common import rotation_to_quaternion

    q = rotation_to_quaternion(np.asarray(rt[:3, :3], np.float64))
    return np.concatenate([np.asarray(rt[:3, 3], np.float64), q])


def _quat_to_pose(v: np.ndarray) -> np.ndarray:
    x, y, z, qr, qx, qy, qz = v
    n = np.sqrt(qr * qr + qx * qx + qy * qy + qz * qz)
    qr, qx, qy, qz = qr / n, qx / n, qy / n, qz / n
    rt = np.eye(4)
    rt[:3, :3] = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qr * qz), 2 * (qx * qz + qr * qy)],
        [2 * (qx * qy + qr * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qr * qx)],
        [2 * (qx * qz - qr * qy), 2 * (qy * qz + qr * qx), 1 - 2 * (qx * qx + qy * qy)],
    ]
    rt[:3, 3] = [x, y, z]
    return rt


# ---------------------------------------------------------------------------
# object-level codecs (className -> read/write of the payload)

_OUR_VERSION = 100  # pinned version for classes whose MRPT layout varies


def _read_object(r: _Reader):
    """Read one WriteObject-framed object: class name, version, payload."""
    len_byte = r.u8()
    if not len_byte & 0x80:
        raise RawlogError(
            "pre-2008 MRPT serialization (old object framing) is not supported"
        )
    name = r.bytes(len_byte & 0x7F).decode("ascii")
    (version,) = r.unpack("<b")
    obj = _read_payload(r, name, version)
    end = r.u8()
    if end != _END_FLAG:
        raise RawlogError(
            f"bad end-of-object flag 0x{end:02x} after {name} (expected 0x88); "
            f"the {name} v{version} payload layout in this file does not match "
            "this build's pinned codec"
        )
    return name, obj


def _write_object(w: _Writer, name: str, obj) -> None:
    w.pack("<B", 0x80 | len(name))
    w.f.write(name.encode("ascii"))
    w.pack("<b", _VERSIONS[name])
    _WRITERS[name](w, obj)
    w.pack("<B", _END_FLAG)


def _read_payload(r: _Reader, name: str, version: int):
    if name not in _READERS:
        raise RawlogError(
            f"unsupported rawlog object class '{name}' (supported: "
            f"{sorted(_READERS)})"
        )
    supported = _SUPPORTED_VERSIONS[name]
    if version not in supported:
        raise UnsupportedVersionError(name, version, supported)
    return _READERS[name](r, version)


def _read_cmatrix(r: _Reader, version: int) -> np.ndarray:
    rows, cols = r.unpack("<II")
    data = np.frombuffer(r.bytes(4 * rows * cols), "<f4")
    return data.reshape(rows, cols).copy()


def _write_cmatrix(w: _Writer, m: np.ndarray) -> None:
    m = np.asarray(m, np.float32)
    w.pack("<II", m.shape[0], m.shape[1])
    w.f.write(np.ascontiguousarray(m).tobytes())


def _read_cpose3d(r: _Reader, version: int) -> np.ndarray:
    return _quat_to_pose(np.array(r.unpack("<7d")))


def _write_cpose3d(w: _Writer, rt: np.ndarray) -> None:
    w.pack("<7d", *_pose_to_quat(rt))


def _read_cimage(r: _Reader, version: int) -> np.ndarray:
    color, h, wdt, ch = r.unpack("<BIIB")
    data = np.frombuffer(r.bytes(h * wdt * ch), np.uint8)
    img = data.reshape(h, wdt, ch)
    return img.copy() if color else img.reshape(h, wdt).copy()


def _write_cimage(w: _Writer, img: np.ndarray) -> None:
    img = np.asarray(img, np.uint8)
    color = img.ndim == 3
    ch = img.shape[2] if color else 1
    w.pack("<BIIB", int(color), img.shape[0], img.shape[1], ch)
    w.f.write(np.ascontiguousarray(img).tobytes())


def _read_obs3d(r: _Reader, version: int) -> Obs3DRangeScan:
    o = Obs3DRangeScan()
    o.sensor_label = r.string()
    (o.timestamp,) = r.unpack("<Q")
    o.sensor_pose = _expect(r, "CPose3D")
    o.max_range, o.std_error = r.unpack("<2f")
    if r.u8():
        o.range_image = _expect(r, "CMatrix")
    if r.u8():
        o.intensity_image = _expect(r, "CImage")
    if r.u8():
        o.confidence_image = _expect(r, "CImage")
    if r.u8():
        (n,) = r.unpack("<I")
        o.points3d = np.frombuffer(r.bytes(12 * n), "<f4").reshape(n, 3).copy()
    return o


def _write_obs3d(w: _Writer, o: Obs3DRangeScan) -> None:
    w.string(o.sensor_label)
    w.pack("<Q", o.timestamp)
    _write_object(w, "CPose3D", o.sensor_pose)
    w.pack("<2f", o.max_range, o.std_error)
    for img, cls in (
        (o.range_image, "CMatrix"),
        (o.intensity_image, "CImage"),
        (o.confidence_image, "CImage"),
    ):
        w.pack("<B", int(img is not None))
        if img is not None:
            _write_object(w, cls, img)
    w.pack("<B", int(o.points3d is not None))
    if o.points3d is not None:
        pts = np.asarray(o.points3d, np.float32)
        w.pack("<I", len(pts))
        w.f.write(np.ascontiguousarray(pts).tobytes())


def _read_obs2d(r: _Reader, version: int) -> Obs2DRangeScan:
    o = Obs2DRangeScan()
    o.sensor_label = r.string()
    (o.timestamp,) = r.unpack("<Q")
    o.sensor_pose = _expect(r, "CPose3D")
    o.aperture, rtl, o.max_range, n = r.unpack("<fBfI")
    o.right_to_left = bool(rtl)
    o.ranges = np.frombuffer(r.bytes(4 * n), "<f4").copy()
    o.validity = np.frombuffer(r.bytes(n), np.uint8).copy()
    return o


def _write_obs2d(w: _Writer, o: Obs2DRangeScan) -> None:
    w.string(o.sensor_label)
    w.pack("<Q", o.timestamp)
    _write_object(w, "CPose3D", o.sensor_pose)
    ranges = np.asarray(o.ranges, np.float32)
    w.pack("<fBfI", o.aperture, int(o.right_to_left), o.max_range, len(ranges))
    w.f.write(np.ascontiguousarray(ranges).tobytes())
    w.f.write(np.ascontiguousarray(np.asarray(o.validity, np.uint8)).tobytes())


def _expect(r: _Reader, want: str):
    name, obj = _read_object(r)
    if name != want:
        raise RawlogError(f"expected nested {want}, found {name}")
    return obj


_READERS = {
    "CMatrix": _read_cmatrix,
    "CPose3D": _read_cpose3d,
    "CImage": _read_cimage,
    "CObservation3DRangeScan": _read_obs3d,
    "CObservation2DRangeScan": _read_obs2d,
}
_WRITERS = {
    "CMatrix": _write_cmatrix,
    "CPose3D": _write_cpose3d,
    "CImage": _write_cimage,
    "CObservation3DRangeScan": _write_obs3d,
    "CObservation2DRangeScan": _write_obs2d,
}
# Versions written by this build / accepted on read.  CMatrix v0 and CPose3D
# v2 are the MRPT 1.x wire layouts; the rest are pinned here (see module doc).
_VERSIONS = {
    "CMatrix": 0,
    "CPose3D": 2,
    "CImage": _OUR_VERSION,
    "CObservation3DRangeScan": _OUR_VERSION,
    "CObservation2DRangeScan": _OUR_VERSION,
}
_SUPPORTED_VERSIONS = {k: (v,) for k, v in _VERSIONS.items()}


# ---------------------------------------------------------------------------
# file-level API

def read_rawlog(path: str | Path) -> Iterator[Obs3DRangeScan | Obs2DRangeScan]:
    """Stream observations from a rawlog (gzip or plain), format #2
    (observations-only), mirroring `getActionObservationPairOrObservation`
    (`LoadRawlog.cpp:182-188`)."""
    path = Path(path)
    with open(path, "rb") as fh:
        magic = fh.read(2)
    opener = gzip.open if magic == _GZIP_MAGIC else open
    with opener(path, "rb") as f:
        r = _Reader(f)
        while not r.peek_eof():
            _, obj = _read_object(r)
            yield obj


def write_rawlog(
    path: str | Path,
    observations: Iterable[Obs3DRangeScan | Obs2DRangeScan],
    compress: bool = True,
) -> None:
    opener = gzip.open if compress else open
    with opener(Path(path), "wb") as f:
        w = _Writer(f)
        for o in observations:
            name = (
                "CObservation3DRangeScan"
                if isinstance(o, Obs3DRangeScan)
                else "CObservation2DRangeScan"
            )
            _write_object(w, name, o)


# ---------------------------------------------------------------------------
# rig assembly (LoadRawlog.cpp:69-92,230-283)

# The reference's 4-sensor capture rig stores observations in a different
# physical order than the ring index; this permutation is applied when
# assembling (`unsigned SensorArrangement[] = {3,0,2,1,...}` at
# `LoadRawlog.cpp:72`).
DEFAULT_ARRANGEMENT = (3, 0, 2, 1)


def _label_index(label: str) -> int | None:
    if label.startswith("RGBD") and label[4:].isdigit():
        return int(label[4:]) - 1
    return None


def assemble_rig_frames(
    observations: Iterable[Obs3DRangeScan | Obs2DRangeScan],
    num_sensors: int = 8,
    num_cameras: int | None = None,
    arrangement: tuple[int, ...] | None = None,
    sync_window_s: float = 0.05,
) -> Iterator[RawRigFrame]:
    """Group ``RGBD<i>`` observations into rig frames.

    A frame is emitted when one observation from every rig camera has arrived
    (`rgbd1 && rgbd2 && ...` at `LoadRawlog.cpp:230`); when the rig has fewer
    cameras than `num_sensors`, the arrangement is tiled around the ring
    exactly as the reference tiles its 4 cameras into 8 slots
    (`LoadRawlog.cpp:72,245-250`).  The camera count is `num_cameras` if
    given, else inferred from the first full cycle of distinct labels.
    `sync_window_s` guards against mixing frames when labels drop out (the
    reference's TODO at `LoadRawlog.cpp:197`).
    """
    pending: dict[int, Obs3DRangeScan] = {}
    n_labels = num_cameras or 0

    def emit(group: dict[int, Obs3DRangeScan]) -> RawRigFrame | None:
        ts = [mrpt_to_unix_timestamp(o.timestamp) for o in group.values()]
        if max(ts) - min(ts) > sync_window_s:
            return None
        if arrangement is not None:
            arr = arrangement
        elif n_labels == len(DEFAULT_ARRANGEMENT):
            arr = DEFAULT_ARRANGEMENT
        else:
            arr = tuple(range(n_labels))
        slots = [group[arr[i % len(arr)] % n_labels] for i in range(num_sensors)]
        rgb = np.stack(
            [
                o.intensity_image
                if o.intensity_image is not None and o.intensity_image.ndim == 3
                else np.repeat(
                    (o.intensity_image
                     if o.intensity_image is not None
                     else np.zeros(o.range_image.shape, np.uint8))[..., None],
                    3, axis=-1,
                )
                for o in slots
            ]
        )
        # float meters -> u16 mm, the reference's convertTo(CV_16UC1, 1000)
        depth = np.stack(
            [
                np.clip(np.nan_to_num(o.range_image) * 1000.0, 0, 65535).astype(
                    np.uint16
                )
                for o in slots
            ]
        )
        return RawRigFrame(
            rgb=rgb,
            depth_mm=depth,
            timestamp=max(o.timestamp for o in group.values()),
        )

    for obs in observations:
        if not isinstance(obs, Obs3DRangeScan):
            continue  # LASER observations ride along; not part of the rig
        idx = _label_index(obs.sensor_label)
        if idx is None:
            continue
        if idx in pending:
            if not n_labels:
                # the first full cycle just ended: it fixes the camera count
                # and itself forms the first frame
                n_labels = len(pending)
                frame = emit(pending)
                if frame is not None:
                    yield frame
            # otherwise a label dropped out mid-frame; discard the stale set
            pending = {}
        pending[idx] = obs
        if n_labels and len(pending) == n_labels:
            frame = emit(pending)
            if frame is not None:
                yield frame
                pending = {}
            else:
                newest = max(pending, key=lambda k: pending[k].timestamp)
                pending = {newest: pending[newest]}
    if not n_labels and pending:
        # stream ended within the first cycle: all observations seen form one
        # frame (a single-capture rawlog)
        n_labels = len(pending)
        frame = emit(pending)
        if frame is not None:
            yield frame


def rig_frame_to_observations(
    frame: RawRigFrame,
    sensor_poses: np.ndarray | None = None,
    timestamp: int | None = None,
) -> list[Obs3DRangeScan]:
    """Inverse of :func:`assemble_rig_frames` for one frame — lets any rig
    capture be exported as a rawlog (and powers round-trip tests)."""
    from rgbd360_tpu.calibration.solver import construction_spec_rt

    n = frame.rgb.shape[0]
    poses = sensor_poses if sensor_poses is not None else construction_spec_rt(n)
    ts = timestamp if timestamp is not None else int(frame.timestamp)
    return [
        Obs3DRangeScan(
            sensor_label=f"RGBD{i + 1}",
            timestamp=ts,
            sensor_pose=np.asarray(poses[i], np.float64),
            range_image=frame.depth_mm[i].astype(np.float32) * 0.001,
            intensity_image=frame.rgb[i],
        )
        for i in range(n)
    ]
