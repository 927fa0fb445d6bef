"""Capture serialization tool (reference `Grabber/RGBD360_Grabber.cpp`).

The reference grabs 8 OpenNI2 sensors over USB and serializes
`sphere_images_*.bin` files.  There is no sensor hardware on a TPU host, so
this tool covers the *serialization* capability: repackage existing
captures (validating the byte format), and synthesize test captures from a
textured virtual room — producing files byte-compatible with
`Frame360::loadFrame`.

Usage:
    python -m rgbd360_tpu.apps.grabber repack  SRC_DIR DST_DIR
    python -m rgbd360_tpu.apps.grabber synth   DST_DIR --frames 5 [--seed 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from rgbd360_tpu.io.bin_format import RawRigFrame, read_rig_frame, write_rig_frame


def synth_capture(
    frame_idx: int,
    seed: int = 0,
    step: float = 0.1,
    radius: float = 3.0,
    rt: np.ndarray | None = None,
) -> RawRigFrame:
    """Synthesize one rig capture of a textured cylindrical room.

    Geometrically consistent: the room is a cylinder of the given radius
    about the rig's vertical (x) axis, texture painted as a function of
    axial position and azimuth, and the camera translates `step` m along the
    axis per frame — so sequences carry real parallax and ground-truth
    motion t = (step * i, 0, 0), exercising the full stitch+track pipeline.
    """
    rng = np.random.default_rng(seed)
    h, w = 240, 320
    fx = fy = 262.5
    cx, cy = 159.5, 119.5
    if rt is None:  # sensor poses: real calibration wins over the spec
        from rgbd360_tpu.calibration.solver import construction_spec_rt

        rt = construction_spec_rt()
    rgb = np.zeros((8, h, w, 3), np.uint8)
    depth = np.zeros((8, h, w), np.uint16)
    u = (np.arange(w) - cx) / fx
    v = (np.arange(h) - cy) / fy
    uu, vv = np.meshgrid(u, v)
    cam = np.array([step * frame_idx, 0.0, 0.0])
    for s in range(8):
        r3 = rt[s, :3, :3]
        t3 = rt[s, :3, 3] + cam
        # ray per pixel in the rig frame, parameterized by sensor z-depth
        d_sensor = np.stack([uu, vv, np.ones_like(uu)], axis=-1)
        d_rig = d_sensor @ r3.T  # (h, w, 3)
        # intersect o + z*d with cylinder y^2 + z^2 = radius^2 (about x axis)
        oy, oz = t3[1], t3[2]
        dy, dz = d_rig[..., 1], d_rig[..., 2]
        a = dy * dy + dz * dz
        b = 2 * (oy * dy + oz * dz)
        c = oy * oy + oz * oz - radius * radius
        disc = np.maximum(b * b - 4 * a * c, 0.0)
        z = (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-9)  # sensor z-depth
        hit = t3 + z[..., None] * d_rig
        axial = hit[..., 0]
        azim = np.arctan2(hit[..., 1], hit[..., 2])
        depth[s] = np.clip(z * 1000, 0, 65535).astype(np.uint16)
        tex = (
            128
            + 70 * np.sin(4 * azim) * np.cos(5.0 * axial)
            + 45 * np.sin(11 * azim + 2.0 * axial)
        )
        tex = np.clip(tex + rng.normal(0, 2, tex.shape), 0, 255).astype(np.uint8)
        rgb[s] = np.stack(
            [tex, tex, np.clip(tex * 0.9, 0, 255).astype(np.uint8)], -1
        )
    return RawRigFrame(rgb=rgb, depth_mm=depth, timestamp=1000000 + frame_idx)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("repack")
    pr.add_argument("src")
    pr.add_argument("dst")
    ps = sub.add_parser("synth")
    ps.add_argument("dst")
    ps.add_argument("--frames", type=int, default=5)
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--calib", default=None,
                    help="calibration root; when given, synthesize with its "
                    "extrinsics so the frames stitch consistently")
    args = p.parse_args(argv)

    dst = Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    if args.cmd == "repack":
        from rgbd360_tpu.io.dataset import SequenceDataset

        ds = SequenceDataset(args.src)
        for idx, raw in zip(ds.indices, ds):
            out = dst / f"sphere_images_{idx}.bin"
            write_rig_frame(out, raw)
            back = read_rig_frame(out)
            assert (back.rgb == raw.rgb).all() and (back.depth_mm == raw.depth_mm).all()
            print(f"repacked {out} ({out.stat().st_size} B, verified)")
    else:
        rt = None
        if args.calib:
            from rgbd360_tpu.io.calib import load_extrinsics

            rt = load_extrinsics(Path(args.calib) / "Extrinsics").astype(np.float64)
        for i in range(args.frames):
            raw = synth_capture(i, args.seed, rt=rt)
            out = dst / f"sphere_images_{i + 1}.bin"
            write_rig_frame(out, raw)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
