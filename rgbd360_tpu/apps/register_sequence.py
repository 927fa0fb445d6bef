"""Batch graph registration of a sphere sequence
(reference `Registration/RegisterGraphSphere.cpp`).

Offline batch mode: register consecutive (and optionally loop) pairs of a
recorded sequence, build the pose graph, optimize, partition, and export.
Unlike the online SLAM drivers this processes the whole sequence as batch
programs — the natural TPU formulation (and the sharded path scales it over
a device mesh with --sharded).

Usage:
    python -m rgbd360_tpu.apps.register_sequence DATASET_DIR --out DIR
        [--window 2] [--sharded]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from rgbd360_tpu.apps._common import add_calib_args, load_calib, save_trajectory_txt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset")
    p.add_argument("--out", default=None)
    p.add_argument("--window", type=int, default=2,
                   help="register each frame to this many predecessors")
    p.add_argument("--sharded", action="store_true",
                   help="use the mesh-sharded distributed optimizer")
    add_calib_args(p)
    args = p.parse_args(argv)

    from rgbd360_tpu.core.frame import FrameBuilder, RigFrame
    from rgbd360_tpu.io.dataset import SequenceDataset
    from rgbd360_tpu.registration import dense as D
    from rgbd360_tpu.registration.planes import PLANAR_3DOF, PlaneRegistration
    from rgbd360_tpu.slam.graph import PoseGraph, optimize_pose_graph
    from rgbd360_tpu.slam.topological import recursive_spectral_partition

    calib = load_calib(args)
    builder = FrameBuilder(calib)
    ds = SequenceDataset(args.dataset)
    n = len(ds)
    if n < 2:
        raise SystemExit("need at least 2 frames")

    # build all frames in batches of 4: the stitch gather indices are
    # calibration-fixed, so one row gather stitches the whole batch
    # (ops/stitch.stitch_batch — the throughput configuration; see bench.py)
    from rgbd360_tpu.ops import stitch as stitch_ops

    seam = stitch_ops.seam_mask_from_maps(builder.maps, 1)
    seam_levels = D.seam_masks_per_level(seam, builder.config.dense.pyramid_levels)
    pyr_of = jax.jit(
        lambda g, d: D.build_frame_pyramid(g, d, builder.config.dense, seam_levels)
    )
    pyrs, planes = [], []
    batch_size = 4
    raws = list(ds)
    for b0 in range(0, n, batch_size):
        chunk = raws[b0 : b0 + batch_size]
        frames = builder.build_batch(
            jnp.stack([jnp.asarray(r.rgb) for r in chunk]),
            jnp.stack([jnp.asarray(r.depth_mm) for r in chunk]),
        )
        for k in range(len(chunk)):
            sphere = jax.tree_util.tree_map(lambda a: a[k], frames)
            pyrs.append(pyr_of(sphere.sphere_gray, sphere.sphere_depth))
            planes.append(builder.segment_planes(sphere))

    aligner = D.DenseAligner(builder.config.dense)
    reg = PlaneRegistration(builder.config.matcher)

    # pairwise registrations
    edges = []
    for j in range(1, n):
        for back in range(1, min(args.window, j) + 1):
            i = j - back
            pb = reg.register(planes[i], planes[j], mode=PLANAR_3DOF)
            seed = jnp.asarray(pb.pose) if bool(pb.success) else jnp.eye(4)
            res = aligner.align(pyrs[j], pyrs[i], seed, method=D.PHOTO_DEPTH)
            if bool(res.ill_posed):
                continue
            edges.append(
                (i, j, np.asarray(res.pose), np.asarray(res.hessian),
                 float(res.sso), float(res.av_depth_residual))
            )
            print(f"edge {i}->{j}: |t|={np.linalg.norm(np.asarray(res.pose)[:3, 3]):.3f} "
                  f"avd={float(res.av_depth_residual):.2f} sso={float(res.sso):.2f}")

    # assemble + optimize the graph
    e_cap = ((len(edges) + 7) // 8) * 8  # pad for even sharding
    g = PoseGraph.empty(n, max(e_cap, 8))
    poses0 = [np.eye(4)]
    rel_of = {(i, j): rel for i, j, rel, *_ in edges}
    for j in range(1, n):
        rel = rel_of.get((j - 1, j), np.eye(4))
        poses0.append(poses0[-1] @ rel)
    from dataclasses import replace

    g = replace(
        g,
        poses=jnp.asarray(np.stack(poses0 + [np.eye(4)] * (0))),
        vmask=jnp.arange(n) < n,
    )
    for e, (i, j, rel, info, sso, _) in enumerate(edges):
        g = replace(
            g,
            edges_ij=g.edges_ij.at[e].set(jnp.asarray([i, j], jnp.int32)),
            rel=g.rel.at[e].set(jnp.asarray(rel)),
            info=g.info.at[e].set(jnp.asarray(info)),
            emask=g.emask.at[e].set(True),
        )

    if args.sharded:
        from rgbd360_tpu.parallel.sharded import distributed_pose_graph, make_mesh

        poses, chi2, iters = distributed_pose_graph(make_mesh(), g)
    else:
        poses, chi2, iters = optimize_pose_graph(g)
    print(f"graph: {n} vertices, {len(edges)} edges, chi2={float(chi2):.4f} "
          f"({int(iters)} LM iters)")

    # topological partition from SSO
    sso = np.zeros((n, n))
    for i, j, _, _, s, _ in edges:
        sso[i, j] = sso[j, i] = s
    labels = recursive_spectral_partition(sso)
    print(f"areas: {labels.max() + 1} -> {labels.tolist()}")

    traj = np.asarray(poses[:n])
    if args.out:
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        save_trajectory_txt(outdir / "trajectory.txt", traj)
        np.savetxt(outdir / "areas.txt", labels, fmt="%d")
        print(f"saved to {outdir}")
    return traj, labels


if __name__ == "__main__":
    main()
