"""Offline frame/sequence viewer (reference `Visualization/LoadFrame360.cpp`,
`LoadSphere.cpp`, `LoadSequence.cpp` — PCL windows replaced by file export).

Modes: sphere PNGs, point cloud PLY, plane overlays, whole-sequence contact
sheet.

Usage:
    python -m rgbd360_tpu.apps.view_frame FRAME.bin --out DIR [--planes] [--cloud]
    python -m rgbd360_tpu.apps.view_frame DATASET_DIR --out DIR --sequence
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from rgbd360_tpu.apps._common import add_calib_args, load_calib

_COLORS = np.array(
    [
        [255, 80, 80], [80, 255, 80], [80, 120, 255], [255, 255, 80],
        [255, 80, 255], [80, 255, 255], [255, 160, 40], [160, 80, 255],
    ]
)


def render_plane_overlay(frame, planes, builder):
    """RGB sphere image with hull polygons + plane ids drawn in."""
    import jax.numpy as jnp

    from rgbd360_tpu.ops import camera

    img = np.asarray(frame.sphere_rgb)[..., ::-1].copy()
    h, w = img.shape[:2]
    hull = np.asarray(planes.hull)
    valid = np.asarray(planes.valid)
    for k in np.where(valid)[0]:
        color = _COLORS[k % len(_COLORS)]
        hp = hull[k]
        for i in range(len(hp)):
            a, b = hp[i], hp[(i + 1) % len(hp)]
            seg = (
                a[None] * (1 - np.linspace(0, 1, 80))[:, None]
                + b[None] * np.linspace(0, 1, 80)[:, None]
            )
            rc, _ = camera.sphere_project(jnp.asarray(seg), h, w)
            rc = np.asarray(rc)
            ok = (rc[:, 0] >= 0) & (rc[:, 0] < h)
            rr = rc[ok, 0].astype(int).clip(0, h - 1)
            cc = rc[ok, 1].astype(int) % w
            for dr in (-1, 0, 1):
                img[(rr + dr).clip(0, h - 1), cc] = color
    return img


def export_frame(builder, raw, outdir: Path, tag: str, planes=False, cloud=False):
    import jax.numpy as jnp

    from rgbd360_tpu.ops import camera
    from rgbd360_tpu.utils.viz import bgr_to_rgb, depth_to_gray, save_ply, save_png

    f = builder.build_from_raw(raw)
    save_png(outdir / f"{tag}_rgb.png", bgr_to_rgb(np.asarray(f.sphere_rgb)))
    save_png(outdir / f"{tag}_depth.png", depth_to_gray(f.sphere_depth))
    msg = [f"{tag}: sphere {tuple(np.asarray(f.sphere_rgb).shape)}"]
    if planes:
        from rgbd360_tpu.io.pbmap import planeset_to_pbplanes, write_pbmap

        ps = builder.segment_planes(f)
        n = int(np.sum(np.asarray(ps.valid)))
        save_png(outdir / f"{tag}_planes.png", render_plane_overlay(f, ps, builder))
        # mrpt-binary plane set next to the cloud, the reference's
        # Frame360::save pairing (`include/Frame360.h:313,321`)
        write_pbmap(outdir / f"{tag}_planes.pbmap", planeset_to_pbplanes(ps))
        msg.append(f"{n} planes (.png + .pbmap)")
    if cloud:
        from rgbd360_tpu.io.pcd import write_pcd

        pts = camera.sphere_backproject(f.sphere_depth)
        npts = save_ply(
            outdir / f"{tag}_cloud.ply",
            np.asarray(pts),
            np.asarray(f.sphere_rgb)[..., ::-1],
            np.asarray(f.sphere_depth) > 0,
        )
        # PCL interchange, like the reference's Frame360::save
        # (`include/Frame360.h:321` writes sphereCloud .pcd)
        m = np.asarray(f.sphere_depth) > 0
        write_pcd(
            outdir / f"{tag}_cloud.pcd",
            np.asarray(pts).reshape(-1, 3)[m.reshape(-1)],
            np.asarray(f.sphere_rgb)[..., ::-1].reshape(-1, 3)[m.reshape(-1)],
        )
        msg.append(f"{npts} cloud points (.ply + .pcd)")
    print("  ".join(msg))
    return f


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help=".bin frame or dataset directory")
    p.add_argument("--out", required=True)
    p.add_argument("--planes", action="store_true")
    p.add_argument("--cloud", action="store_true")
    p.add_argument("--sequence", action="store_true")
    p.add_argument("--video", action="store_true",
                   help="also write sequence.gif of the sphere RGB frames "
                   "(the reference sequence viewer's save-video mode, "
                   "LoadSequence.cpp:59-65)")
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument(
        "--pbmap",
        default=None,
        help="with a .pcd input: paired mrpt-binary plane set to overlay "
        "(reference load_PbMap_Cloud, Frame360.h:213); defaults to "
        "<input>_planes.pbmap when that file exists",
    )
    add_calib_args(p)
    args = p.parse_args(argv)

    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.bin_format import read_rig_frame
    from rgbd360_tpu.io.dataset import SequenceDataset

    if str(args.input).endswith(".pcd"):
        # saved-cloud viewer (reference Visualization/LoadSphere.cpp):
        # re-render the cloud as a spherical panorama PNG + stats
        import jax.numpy as jnp

        from rgbd360_tpu.io.pcd import read_pcd
        from rgbd360_tpu.ops import camera
        from rgbd360_tpu.utils.viz import save_png

        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        xyz, rgb = read_pcd(args.input)
        h, w = 320, 1920
        rc, rho = camera.sphere_project(jnp.asarray(xyz), h, w)
        rc, rho = np.asarray(rc), np.asarray(rho)
        valid = np.isfinite(rc).all(axis=1) & (rho > 1e-6)
        img = np.zeros((h, w, 3), np.uint8)
        rr = rc[valid, 0].astype(int).clip(0, h - 1)
        cc = rc[valid, 1].astype(int) % w
        img[rr, cc] = rgb[valid] if rgb is not None else 200
        tag = Path(args.input).stem
        # paired mrpt-binary plane set (reference load_PbMap_Cloud pairing,
        # `Frame360.h:213`: sphereCloud_i.pcd + spherePlanes_i.pbmap)
        pbmap_path = args.pbmap
        if pbmap_path is None:
            inp = Path(args.input)
            # candidate pairings: <tag>_planes.pbmap; this tool's own
            # export naming (<base>_cloud.pcd + <base>_planes.pbmap); the
            # reference's naming (sphereCloud_i.pcd + spherePlanes_i.pbmap,
            # `Frame360.h:213`)
            names = [f"{tag}_planes.pbmap"]
            if tag.endswith("_cloud"):
                names.append(f"{tag[: -len('_cloud')]}_planes.pbmap")
            if "Cloud" in tag:
                names.append(f"{tag.replace('Cloud', 'Planes')}.pbmap")
            pbmap_path = next(
                (c for n in names if (c := inp.with_name(n)).exists()), None
            )
        n_pl = 0
        if pbmap_path is not None:
            from rgbd360_tpu.io.pbmap import read_pbmap

            pb = read_pbmap(pbmap_path)
            n_pl = len(pb)
            for k, pl in enumerate(pb):
                color = _COLORS[k % len(_COLORS)]
                poly = np.asarray(pl.polygon, np.float32)
                if len(poly) < 2:
                    continue
                t = np.linspace(0, 1, 80)[:, None]
                for i in range(len(poly)):
                    a, b = poly[i], poly[(i + 1) % len(poly)]
                    seg = a[None] * (1 - t) + b[None] * t
                    src, _ = camera.sphere_project(jnp.asarray(seg), h, w)
                    src = np.asarray(src)
                    ok = (src[:, 0] >= 0) & (src[:, 0] < h)
                    img[src[ok, 0].astype(int).clip(0, h - 1),
                        src[ok, 1].astype(int) % w] = color
        save_png(outdir / f"{tag}_pano.png", img)
        r = np.linalg.norm(xyz, axis=1)
        extra = f", {n_pl} pbmap planes" if pbmap_path is not None else ""
        print(
            f"{tag}: {len(xyz)} points{extra}, radius median "
            f"{np.median(r):.2f} m (min {r.min():.2f}, max {r.max():.2f}) "
            f"-> {outdir / f'{tag}_pano.png'}"
        )
        return

    calib = load_calib(args)
    builder = FrameBuilder(calib)
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    if args.sequence or Path(args.input).is_dir():
        ds = SequenceDataset(args.input)
        video = []
        for i, raw in enumerate(ds):
            f = export_frame(
                builder, raw, outdir, f"frame_{ds.indices[i]}", args.planes, args.cloud
            )
            if args.video:
                from rgbd360_tpu.utils.viz import bgr_to_rgb

                video.append(bgr_to_rgb(np.asarray(f.sphere_rgb)))
        if args.video and video:
            from rgbd360_tpu.utils.viz import save_gif

            save_gif(outdir / "sequence.gif", video, fps=args.fps)
            print(f"wrote {outdir / 'sequence.gif'} ({len(video)} frames)")
    else:
        export_frame(
            builder, read_rig_frame(args.input), outdir, Path(args.input).stem,
            args.planes, args.cloud,
        )


if __name__ == "__main__":
    main()
