"""Keyframe SLAM over a capture directory (reference `SLAM/KFsphere_SLAM.cpp`).

Usage:
    python -m rgbd360_tpu.apps.kf_slam DATASET_DIR [--out DIR]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from rgbd360_tpu.apps._common import add_calib_args, load_calib, save_trajectory_txt


def export_map(slam, outdir: Path, voxel: float = 0.05):
    """Write the map viewer's four view modes as files (reference
    `Map360_Visualizer` modes, `include/Map360_Visualizer.h:63-68`):

    1. `map.ply`            voxel-filtered global cloud
    2. `kf_XXX.ply`         per-keyframe overlapping clouds (world frame)
    3. `selected_kfs.ply`   representative keyframes only (one per area)
    4. `topology.ply`       keyframe graph: vertices colored by area + edges

    plus `trajectory.ply` / `trajectory_opt.ply` (tracked vs optimized
    poses, which the viewer overlays) and the checkpointable map state.
    """
    if hasattr(slam, "flush"):
        slam.flush()  # apply any deferred keyframe-event work first
    import jax.numpy as jnp

    from rgbd360_tpu.ops import camera, se3
    from rgbd360_tpu.ops.filters import voxel_downsample
    from rgbd360_tpu.utils.viz import (
        AREA_COLORS,
        save_graph_ply,
        save_ply,
        save_trajectory_ply,
    )

    n_kf = int(slam.map.n_kf)
    area = np.asarray(slam.map.area[:n_kf])
    pts_all, col_all = [], []
    kf_clouds = []
    for k in range(n_kf):
        d = np.asarray(slam.map.depth[k], np.float32)
        pts = camera.sphere_backproject(jnp.asarray(d))
        pose = jnp.asarray(np.asarray(slam.map.opt_poses[k]))
        pts_w = se3.transform_points(pose, pts.reshape(-1, 3))
        mask = d.reshape(-1) > 0
        p = np.asarray(pts_w)[mask][::4]
        g = np.asarray(slam.map.gray[k], np.float32).reshape(-1)[mask][::4]
        c = np.stack([g * 255] * 3, axis=1)
        pts_all.append(p)
        col_all.append(c)
        kf_clouds.append((p, c))
    pts = np.vstack(pts_all)
    cols = np.vstack(col_all)

    # mode 1: voxelized global map (.ply + PCL .pcd interchange)
    from rgbd360_tpu.io.pcd import write_pcd

    pts_v, cols_v = voxel_downsample(pts, voxel, cols)
    n = save_ply(outdir / "map.ply", pts_v, cols_v)
    write_pcd(outdir / "map.pcd", pts_v, cols_v)
    # mode 2: overlapping per-keyframe clouds
    for k, (p, c) in enumerate(kf_clouds):
        save_ply(outdir / f"kf_{k:03d}.ply", p[::4], c[::4])
    # mode 3: representative keyframes only (first KF of each area — the
    # viewer's vSelectedKFs view)
    sel = [int(np.argmax(area == a)) for a in np.unique(area)]
    if sel:
        save_ply(
            outdir / "selected_kfs.ply",
            np.vstack([kf_clouds[k][0] for k in sel]),
            np.vstack([kf_clouds[k][1] for k in sel]),
        )
    # mode 4: keyframe topology (vertices colored by area, graph edges)
    centers = np.asarray(slam.map.opt_poses[:n_kf, :3, 3])
    edges = np.asarray(slam.map.graph.edges_ij)[np.asarray(slam.map.graph.emask)]
    edges = edges[(edges[:, 0] < n_kf) & (edges[:, 1] < n_kf)]
    save_graph_ply(
        outdir / "topology.ply", centers, edges, AREA_COLORS[area % len(AREA_COLORS)]
    )

    save_trajectory_ply(outdir / "trajectory.ply", np.stack(slam.trajectory))
    save_trajectory_ply(outdir / "trajectory_opt.ply", np.asarray(slam.map.opt_poses[:n_kf]))
    slam.map.save(str(outdir / "map.npz"))
    print(
        f"map: {n} voxelized points -> {outdir}/map.ply; {n_kf} KF clouds, "
        f"{len(sel)} selected, topology + trajectories; state -> map.npz"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset")
    p.add_argument("--out", default=None)
    p.add_argument("--pbmap", action="store_true",
                   help="PbMap-tracking graph SLAM (reference SphereGraphSLAM)")
    p.add_argument("--timing", action="store_true",
                   help="print per-stage wall times (the reference's stage timers)")
    p.add_argument("--plane-ba", action="store_true",
                   help="final joint refinement of keyframe poses + global "
                   "plane landmarks (Schur-complement planar BA)")
    p.add_argument("--gt", default=None, metavar="FILE",
                   help="ground-truth poses (N x 16 rows, flattened 4x4 — the "
                   "grabber synth gt_poses.txt format); prints ATE/RPE after "
                   "the run")
    p.add_argument("--salient", type=int, default=0, metavar="K",
                   help="track with K stratified-salient pixels at the finest "
                   "level instead of dense sweeps (the reference's "
                   "bUseSalientPixels; 16384 doubles frontend throughput at "
                   "~3.5 mm pose difference on the samples)")
    p.add_argument("--lc-salient", type=int, default=None, metavar="K",
                   help="thin the loop-closure VERIFY sweeps to K salient "
                   "pixels (+2 mandatory dense polish iterations; measured "
                   "to reproduce full-sweep accept/reject decisions within "
                   "4%% — LoopClosureConfig.verify_salient_pixels; default "
                   "16384 since round 4, pass 0 for full sweeps)")
    add_calib_args(p)
    args = p.parse_args(argv)

    import dataclasses

    from rgbd360_tpu.config import default_config
    from rgbd360_tpu.core.frame import FrameBuilder
    from rgbd360_tpu.io.dataset import SequenceDataset
    from rgbd360_tpu.slam.odometry import KeyframeSLAM
    from rgbd360_tpu.slam.pbmap_slam import PbMapGraphSLAM

    from rgbd360_tpu.apps._common import frame_config

    calib = load_calib(args)
    config = frame_config(args, default_config())
    if args.salient:
        # polish_iters=2: dense finishing sweeps keep salient tracking at
        # dense-grade accuracy (see DenseRegConfig.polish_iters)
        config = dataclasses.replace(
            config,
            dense=dataclasses.replace(
                config.dense, salient_pixels=args.salient, polish_iters=2
            ),
        )
    if args.lc_salient is not None:
        config = dataclasses.replace(
            config,
            lc=dataclasses.replace(
                config.lc, verify_salient_pixels=args.lc_salient
            ),
        )
    builder = FrameBuilder(calib, config)
    ds = SequenceDataset(args.dataset)
    if len(ds) == 0:
        raise SystemExit(f"no sphere_images_*.bin found in {args.dataset}")

    slam = PbMapGraphSLAM(builder) if args.pbmap else KeyframeSLAM(builder)
    for i, raw in enumerate(ds):
        ev = slam.process(raw)
        pose = slam.trajectory[-1]
        # With async keyframe events (the default), ev's loop-closure stats
        # are filled in on LATER frames as the deferred phases complete —
        # so log the tracker's cumulative counter, which is always current.
        lc_total = getattr(slam, "n_loop_closures", ev.get("loop_closures", 0))
        print(
            f"frame {ds.indices[i]}: kf={ev.get('keyframe')} "
            f"lc_total={lc_total} t={np.round(pose[:3, 3], 3).tolist()}"
        )

    if hasattr(slam, "flush"):
        slam.flush()  # apply any deferred keyframe-event work
    n_kf = int(slam.map.n_kf)
    print(
        f"done: {n_kf} keyframes, {int(slam.map.n_edges)} edges, "
        f"{int(slam.map.n_areas)} areas"
    )
    if args.plane_ba and n_kf >= 2:
        import jax
        import jax.numpy as jnp

        from rgbd360_tpu.slam.plane_ba import associate_planes, optimize_plane_ba

        sets = [
            jax.tree_util.tree_map(lambda a: a[k], slam.map.planes)
            for k in range(n_kf)
        ]
        prob = associate_planes(
            [jnp.asarray(np.asarray(slam.map.opt_poses[k])) for k in range(n_kf)],
            sets,
            max_planes=64,
        )
        poses, planes, chi2, iters = optimize_plane_ba(prob)
        full = jnp.asarray(np.asarray(slam.map.opt_poses)).at[:n_kf].set(poses)
        slam.map = slam.map.with_optimized(full)
        n_lm = int(np.sum(np.linalg.norm(np.asarray(prob.planes)[:, :3], axis=1) > 0.5))
        print(
            f"plane BA: {n_lm} landmarks, {int(prob.obs.shape[0])} observations, "
            f"chi2={float(chi2):.4f} in {int(iters)} LM iters"
        )
    if args.gt:
        from rgbd360_tpu.utils.metrics import ate_rmse, rpe, trajectory_length

        gt = np.loadtxt(args.gt).reshape(-1, 4, 4)
        est = np.stack(slam.trajectory)
        n = min(len(gt), len(est))
        ate = ate_rmse(est[:n], gt[:n])
        rpe_t, rpe_r = rpe(est[:n], gt[:n])
        print(
            f"ATE {ate:.4f} m over {n} frames "
            f"(path {trajectory_length(gt[:n]):.2f} m); "
            f"RPE {rpe_t:.4f} m / {rpe_r:.4f} rad per frame"
        )
        if hasattr(slam, "optimized_trajectory"):
            opt = slam.optimized_trajectory()[:n]
            print(
                f"ATE (optimized, frames re-anchored to corrected keyframes) "
                f"{ate_rmse(opt, gt[:n]):.4f} m"
            )
    if args.timing and hasattr(slam, "timer"):
        print(slam.timer.report())
    if args.out:
        outdir = Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        save_trajectory_txt(outdir / "trajectory.txt", np.stack(slam.trajectory))
        export_map(slam, outdir)
    return slam


if __name__ == "__main__":
    main()
