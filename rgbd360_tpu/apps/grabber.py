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


def synth_capture(frame_idx: int, seed: int = 0) -> RawRigFrame:
    """Synthesize one rig capture of a textured cylindrical room viewed by
    the 8-sensor ring (approximate construction-spec geometry)."""
    rng = np.random.default_rng(seed)
    h, w = 240, 320
    fx = fy = 262.5
    cx, cy = 159.5, 119.5
    rgb = np.zeros((8, h, w, 3), np.uint8)
    depth = np.zeros((8, h, w), np.uint16)
    u = (np.arange(w) - cx) / fx
    v = (np.arange(h) - cy) / fy
    uu, vv = np.meshgrid(u, v)
    # camera walks slowly along the room axis
    cam_shift = 0.1 * frame_idx
    for s in range(8):
        ang = 2 * np.pi * s / 8
        # ray azimuth per pixel: sensor rotated 90 deg (portrait) like the rig
        theta = ang + np.arctan(vv)  # vertical image axis spans azimuth
        radius = 3.0 + 0.5 * np.sin(3 * theta)
        d = radius / np.sqrt(1 + uu**2 + vv**2)
        depth[s] = np.clip(d * 1000, 0, 65535).astype(np.uint16)
        tex = (
            128
            + 80 * np.sin(8 * theta + cam_shift)
            + 40 * np.cos(12 * uu * 3 + s)
        )
        tex = np.clip(tex + rng.normal(0, 3, tex.shape), 0, 255).astype(np.uint8)
        rgb[s] = np.stack([tex, tex, np.clip(tex * 0.9, 0, 255).astype(np.uint8)], -1)
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
        for i in range(args.frames):
            raw = synth_capture(i, args.seed)
            out = dst / f"sphere_images_{i + 1}.bin"
            write_rig_frame(out, raw)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
