"""Semantic plane labeling (reference `Labelization/LabelizeFrame360.cpp` and
`LabelizeSequence.cpp`) — GUI replaced by overlay renders + JSON label input.

Subcommands:
  render     — export plane-overlay PNGs with plane indices for inspection
  apply      — assign labels to planes of a frame from a JSON mapping
               {"3": "wall", "5": {"name": "table", "level": "object"}}
  propagate  — register consecutive frames and propagate labels along
               matched planes (the reference's label voting)
  stats      — per-label counts

Usage:
    python -m rgbd360_tpu.apps.labelize render DATASET --out DIR
    python -m rgbd360_tpu.apps.labelize apply DATASET --frame 1 \
        --labels labels.json --store store.json
    python -m rgbd360_tpu.apps.labelize propagate DATASET --store store.json
    python -m rgbd360_tpu.apps.labelize stats --store store.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from rgbd360_tpu.apps._common import add_calib_args, load_calib


def _builder_and_ds(args):
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.dataset import SequenceDataset

    calib = load_calib(args)
    return FrameBuilder(calib), SequenceDataset(args.dataset)


def cmd_render(args):
    from rgbd360_tpu.apps.view_frame import render_plane_overlay
    from rgbd360_tpu.utils.viz import save_png

    builder, ds = _builder_and_ds(args)
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    for i, raw in enumerate(ds):
        f = builder.build_from_raw(raw)
        ps = builder.segment_planes(f)
        img = render_plane_overlay(f, ps, builder)
        save_png(outdir / f"frame_{ds.indices[i]}_planes.png", img)
        ids = np.where(np.asarray(ps.valid))[0].tolist()
        centers = np.round(np.asarray(ps.center)[ids], 2).tolist()
        areas = np.round(np.asarray(ps.area)[ids], 2).tolist()
        meta = [
            {"plane": int(k), "center": c, "area": a}
            for k, c, a in zip(ids, centers, areas)
        ]
        json.dump(meta, open(outdir / f"frame_{ds.indices[i]}_planes.json", "w"), indent=1)
        print(f"frame {ds.indices[i]}: {len(ids)} planes -> overlay + metadata")


def cmd_apply(args):
    from rgbd360_tpu.slam.labeling import LabelStore

    builder, ds = _builder_and_ds(args)
    store = (
        LabelStore.load(args.store)
        if Path(args.store).exists()
        else LabelStore(capacity=builder.config.seg.max_planes)
    )
    mapping = json.load(open(args.labels))
    for plane_str, spec in mapping.items():
        if isinstance(spec, str):
            name, level = spec, "plane"
        else:
            name, level = spec["name"], spec.get("level", "plane")
        store.set_label(args.frame, int(plane_str), name, level)
        print(f"frame {args.frame} plane {plane_str} <- {name} ({level})")
    store.save(args.store)


def cmd_propagate(args):
    from rgbd360_tpu.registration.planes import ODOMETRY_6DOF, PlaneRegistration
    from rgbd360_tpu.slam.labeling import LabelStore

    builder, ds = _builder_and_ds(args)
    store = LabelStore.load(args.store)
    reg = PlaneRegistration(builder.config.matcher)
    plane_sets = {}
    for i, raw in enumerate(ds):
        f = builder.build_from_raw(raw)
        plane_sets[ds.indices[i]] = builder.segment_planes(f)

    frames = sorted(plane_sets)
    for a, b in zip(frames[:-1], frames[1:]):
        res = reg.register(plane_sets[a], plane_sets[b], mode=ODOMETRY_6DOF)
        pairs = np.asarray(res.pairs)
        store.propagate(a, b, pairs)
        n_prop = sum(
            1 for i_, j_ in pairs if i_ >= 0 and store.labels_for(b)[0, j_] >= 0
        )
        print(f"{a} -> {b}: {int(res.n_matches)} matches, {n_prop} labeled planes in {b}")
    store.save(args.store)


def cmd_stats(args):
    from rgbd360_tpu.slam.labeling import LabelStore, label_statistics

    store = LabelStore.load(args.store)
    for level in ("plane", "object", "context"):
        stats = label_statistics(store, level)
        if stats:
            print(f"{level}: {stats}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render")
    pr.add_argument("dataset")
    pr.add_argument("--out", required=True)
    add_calib_args(pr)
    pr.set_defaults(fn=cmd_render)

    pa = sub.add_parser("apply")
    pa.add_argument("dataset")
    pa.add_argument("--frame", type=int, required=True)
    pa.add_argument("--labels", required=True)
    pa.add_argument("--store", required=True)
    add_calib_args(pa)
    pa.set_defaults(fn=cmd_apply)

    pp = sub.add_parser("propagate")
    pp.add_argument("dataset")
    pp.add_argument("--store", required=True)
    add_calib_args(pp)
    pp.set_defaults(fn=cmd_propagate)

    pst = sub.add_parser("stats")
    pst.add_argument("--store", required=True)
    pst.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
